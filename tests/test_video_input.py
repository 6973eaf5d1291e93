"""Video-input inference mode (VERDICT r3 task 3): continue generation from
existing mp4 clips — ``--input_video`` and the ``--video_root_dir`` category
scan with per-clip control .txt → vocab captions (≙ reference mp4_data,
fastvideo/sample/sample.py:487-584)."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    """test_video/-shaped fixture: <root>/<category>/clip.mp4 + clip.txt."""
    from yume_tpu.utils.video import save_video

    root = tmp_path_factory.mktemp("test_video")
    rng = np.random.default_rng(7)
    base = np.linspace(0, 1, 32)[None, :, None] * np.ones((32, 1, 3))
    frames = np.stack([
        np.clip(base + i * 0.04 + rng.normal(0, 0.003, base.shape), 0, 1)
        for i in range(8)
    ]) * 2.0 - 1.0
    cat = root / "key_forward"
    cat.mkdir()
    save_video(frames.astype(np.float32), str(cat / "clip.mp4"), fps=8)
    (cat / "clip.txt").write_text(
        "Start Frame: 0\nEnd Frame: 8\nKeys: W\nMouse: ·\n")
    return str(root)


def test_iter_video_samples_builds_vocab_caption(video_tree):
    import argparse

    from yume_tpu.data.controls import control_caption
    from yume_tpu.sample import iter_video_samples

    args = argparse.Namespace(input_video=None, video_root_dir=video_tree,
                              smoke=True, video_frames=5, prompt="fallback")
    out = list(iter_video_samples(args, (32, 32)))
    assert len(out) == 1
    video, caption, name = out[0]
    assert name  # per-clip output stem (globally unique across hosts)
    assert video.shape == (1, 5, 32, 32, 3)
    assert float(video.min()) >= -1.01 and float(video.max()) <= 1.01
    # the .txt control parses into the key/mouse vocab caption
    assert caption == control_caption("W", "·")


def test_video_root_dir_cli_smoke(video_tree, tmp_path):
    """5B path: the clip VAE-encodes to history latents and the packed
    segment rollout continues it."""
    from yume_tpu import sample as sample_mod

    rc = sample_mod.main([
        "--smoke", "--video_root_dir", video_tree, "--sample_num", "2",
        "--output_dir", str(tmp_path)])
    assert rc == 0
    outs = sorted(glob.glob(os.path.join(str(tmp_path), "video*_seg*.mp4")))
    assert len(outs) == 2


def test_input_video_cli_smoke_14b(video_tree, tmp_path):
    """14B path: first frame repeated as pseudo-history, generate_next
    rollout with growing history (reference sample.py:686-714)."""
    from yume_tpu import sample as sample_mod

    mp4 = os.path.join(video_tree, "key_forward", "clip.mp4")
    rc = sample_mod.main([
        "--smoke", "--config", "i2v-14B", "--input_video", mp4,
        "--steps", "2", "--output_dir", str(tmp_path)])
    assert rc == 0
    outs = glob.glob(os.path.join(str(tmp_path), "video*_seg*.mp4"))
    assert len(outs) == 1


def test_input_video_distilled_cond_only(video_tree, tmp_path, monkeypatch):
    """--distilled in video-input mode must run cond-only (ctx_null=None) —
    it was silently ignored (full CFG) before."""
    from yume_tpu import sample as sample_mod
    from yume_tpu.pipelines.i2v import I2VPipeline

    seen = []
    orig = I2VPipeline.generate_next

    def spy(self, history, ctx, ctx_null, **kw):
        seen.append(ctx_null)
        return orig(self, history, ctx, ctx_null, **kw)

    monkeypatch.setattr(I2VPipeline, "generate_next", spy)
    mp4 = os.path.join(video_tree, "key_forward", "clip.mp4")
    rc = sample_mod.main([
        "--smoke", "--config", "i2v-14B", "--input_video", mp4, "--distilled",
        "--steps", "2", "--output_dir", str(tmp_path)])
    assert rc == 0
    assert seen and all(c is None for c in seen)


def test_video_mode_no_inputs_raises(tmp_path):
    from yume_tpu import sample as sample_mod

    with pytest.raises(FileNotFoundError):
        sample_mod.main([
            "--smoke", "--video_root_dir", str(tmp_path / "empty"),
            "--output_dir", str(tmp_path)])
