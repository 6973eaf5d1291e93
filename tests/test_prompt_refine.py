"""InternVL dynamic tiling parity (reference fastvideo/sample/sample_5b.py:
73-147): grid selection, tile crops, thumbnail, ImageNet normalisation."""

import numpy as np

from yume_tpu.data.prompt_refine import (TemplateRefiner, dynamic_tile_image,
                                         find_closest_aspect_ratio)


def test_grid_selection_matches_reference_rule():
    target = sorted(
        {(i, j) for n in range(1, 13) for i in range(1, n + 1)
         for j in range(1, n + 1) if 1 <= i * j <= 12},
        key=lambda x: x[0] * x[1])
    # 2:1 image → (2, 1); square → (1, 1); 3:4 → (3, 4)
    assert find_closest_aspect_ratio(2.0, target, 896, 448, 448) == (2, 1)
    assert find_closest_aspect_ratio(1.0, target, 448, 448, 448) == (1, 1)
    assert find_closest_aspect_ratio(0.75, target, 672, 896, 448) == (3, 4)


def test_tiling_counts_and_shapes():
    from PIL import Image

    rng = np.random.default_rng(0)
    # 2:1 → 2 tiles + thumbnail
    img = Image.fromarray((rng.random((448, 896, 3)) * 255).astype(np.uint8))
    px = dynamic_tile_image(img)
    assert px.shape == (3, 3, 448, 448)
    # square small → 1 tile, NO thumbnail (reference: use_thumbnail only
    # when >1 tile)
    img = Image.fromarray((rng.random((100, 100, 3)) * 255).astype(np.uint8))
    px = dynamic_tile_image(img)
    assert px.shape == (1, 3, 448, 448)


def test_tile_content_and_normalisation():
    from PIL import Image

    # constant-color image: every tile must normalise to the same value
    arr = np.full((448, 896, 3), 128, np.uint8)
    px = dynamic_tile_image(Image.fromarray(arr))
    want = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    got = px.astype(np.float64).mean(axis=(0, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # left/right tiles of a half-black half-white image differ
    arr = np.zeros((448, 896, 3), np.uint8)
    arr[:, 448:] = 255
    px = dynamic_tile_image(Image.fromarray(arr))
    assert px[0].mean() < px[1].mean()


def test_numpy_input_accepted():
    video_frame = np.random.default_rng(1).uniform(-1, 1, (64, 80, 3))
    px = dynamic_tile_image(video_frame.astype(np.float32))
    assert px.shape[1:] == (3, 448, 448)
    assert np.isfinite(px).all()


def test_template_refiner_adds_fpv_clause():
    r = TemplateRefiner()
    out = r("Person moves forward (W).")
    assert out.startswith("This video depicts a city walk scene")
    assert r(out) == out  # idempotent
