"""Native libavcodec frame decoder vs the OpenCV reader (native/
yume_decode.cpp — ≙ the reference's decord dependency,
fastvideo/dataset/t2v_datasets.py)."""

import numpy as np
import pytest

from yume_tpu.data import native


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    from yume_tpu.utils.video import save_video

    rng = np.random.default_rng(0)
    # smooth gradient frames: codecs keep these nearly lossless
    base = np.linspace(0, 1, 32)[None, :, None] * np.ones((32, 1, 3))
    frames = np.stack([
        np.clip(base + i / 24.0 * 0.5 + rng.normal(0, 0.003, base.shape), 0, 1)
        for i in range(24)
    ]) * 2.0 - 1.0
    path = str(tmp_path_factory.mktemp("vid") / "t.mp4")
    save_video(frames.astype(np.float32), path, fps=8)
    return path


@pytest.mark.skipif(not native.have_native_decode(),
                    reason="libyume_decode.so not built")
def test_native_decode_matches_cv2(mp4):
    import cv2

    idx = [0, 3, 3, 7, 2]  # unordered + repeated — the reader contract
    got = native.decode_frames(mp4, idx)
    assert got is not None and got.shape[0] == len(idx)

    cap = cv2.VideoCapture(mp4)
    ref = {}
    pos = 0
    while pos <= max(idx):
        ok, frame = cap.read()
        if not ok:
            break
        if pos in set(idx):
            ref[pos] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        pos += 1
    cap.release()
    want = np.stack([ref[i] for i in idx])
    # both decode the same H.264 stream; differences are YUV→RGB rounding
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 12


@pytest.mark.skipif(not native.have_native_decode(),
                    reason="libyume_decode.so not built")
def test_native_frame_count(mp4):
    assert native.video_frame_count(mp4) == 24


@pytest.mark.skipif(not native.have_native_decode(),
                    reason="libyume_decode.so not built")
def test_read_video_frames_uses_native(mp4):
    from yume_tpu.data.dataset import read_video_frames, video_length

    out = read_video_frames(mp4, [0, 5], size=(16, 16))
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert video_length(mp4) == 24
