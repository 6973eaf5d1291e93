"""Checkpointing: Orbax save/restore + torch-weight import bridges.

Replaces the reference's FSDP checkpoint machinery
(fastvideo/utils/checkpoint.py): sharded async Orbax checkpoints for
training state, plus converters that map the released torch
state_dicts (safetensors / .pth) onto our flax parameter pytrees
(equivalent of `resume_checkpoint_yume`, fastvideo/utils/checkpoint.py:285-337).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import numpy as np


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    """torch tensor (or ndarray) → float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def conv3d_kernel(w) -> np.ndarray:
    """torch Conv3d weight (O, I, kT, kH, kW) → flax (kT, kH, kW, I, O)."""
    return _t(w).transpose(2, 3, 4, 1, 0)


def conv2d_as_3d_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) → flax 3D (1, kH, kW, I, O)."""
    return _t(w).transpose(2, 3, 1, 0)[None]


def dense_kernel(w) -> np.ndarray:
    """torch Linear weight (O, I) → flax (I, O)."""
    return _t(w).T


def conv1x1_as_dense(w) -> np.ndarray:
    """torch 1×1 Conv2d weight (O, I, 1, 1) → flax Dense (I, O)."""
    return _t(w)[:, :, 0, 0].T


def set_in(tree: Dict, path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


_WRAPPER_SEGMENTS = frozenset(
    ("module", "_fsdp_wrapped_module", "_checkpoint_wrapped_module",
     "_orig_mod"))


def normalize_torch_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop FSDP/compile wrapper segments anywhere in the key path.

    The reference loads released checkpoints with ``strict=False`` after
    they were saved through FSDP FULL_STATE_DICT / activation-checkpoint
    wrappers (fastvideo/utils/checkpoint.py:285-337); wrapper segments like
    ``module.`` / ``_fsdp_wrapped_module.`` must not defeat key matching.
    (Whole segments, not substrings — ``module`` is a substring of
    ``_fsdp_wrapped_module``.)
    """
    out = {}
    for k, v in sd.items():
        out[".".join(s for s in k.split(".")
                     if s not in _WRAPPER_SEGMENTS)] = v
    return out


class _TrackedSD(Mapping):
    """Read-tracking view of a torch state dict, for strict=False loading
    with missing/unexpected-key reporting (≙ resume_checkpoint_yume's
    ``m, u = model.load_state_dict(..., strict=False)`` report,
    fastvideo/utils/checkpoint.py:318-333)."""

    def __init__(self, sd: Mapping[str, Any], tolerant: bool):
        self.sd = sd
        self.tolerant = tolerant
        self.consumed: set = set()
        self.missing: list = []

    def __getitem__(self, k):
        if k not in self.sd:
            self.missing.append(k)
            raise KeyError(k)
        self.consumed.add(k)
        return self.sd[k]

    def __contains__(self, k):
        ok = k in self.sd
        if ok:
            self.consumed.add(k)
        return ok

    def __iter__(self):
        return iter(self.sd)

    def __len__(self):
        return len(self.sd)

    def unexpected(self):
        return sorted(set(self.sd) - self.consumed)


# ---------------------------------------------------------------------------
# VAE (Wan2.2) torch → flax
# ---------------------------------------------------------------------------


def convert_vae22_state_dict(sd: Mapping[str, Any], num_res_blocks: int = 2) -> Dict:
    """Map a reference Wan2.2 VAE state_dict (wan23/modules/vae2_2.py naming)
    onto yume_tpu.models.vae.WanVAE params."""
    params: Dict = {}

    def res_block(src: str, dst: str):
        set_in(params, f"{dst}/norm1/gamma", _t(sd[f"{src}.residual.0.gamma"]).reshape(-1))
        set_in(params, f"{dst}/conv1/conv/kernel", conv3d_kernel(sd[f"{src}.residual.2.weight"]))
        set_in(params, f"{dst}/conv1/conv/bias", _t(sd[f"{src}.residual.2.bias"]))
        set_in(params, f"{dst}/norm2/gamma", _t(sd[f"{src}.residual.3.gamma"]).reshape(-1))
        set_in(params, f"{dst}/conv2/conv/kernel", conv3d_kernel(sd[f"{src}.residual.6.weight"]))
        set_in(params, f"{dst}/conv2/conv/bias", _t(sd[f"{src}.residual.6.bias"]))
        if f"{src}.shortcut.weight" in sd:
            set_in(params, f"{dst}/shortcut/conv/kernel",
                   conv3d_kernel(sd[f"{src}.shortcut.weight"]))
            set_in(params, f"{dst}/shortcut/conv/bias", _t(sd[f"{src}.shortcut.bias"]))

    def attn(src: str, dst: str):
        set_in(params, f"{dst}/norm/gamma", _t(sd[f"{src}.norm.gamma"]).reshape(-1))
        set_in(params, f"{dst}/to_qkv/kernel", conv1x1_as_dense(sd[f"{src}.to_qkv.weight"]))
        set_in(params, f"{dst}/to_qkv/bias", _t(sd[f"{src}.to_qkv.bias"]))
        set_in(params, f"{dst}/proj/kernel", conv1x1_as_dense(sd[f"{src}.proj.weight"]))
        set_in(params, f"{dst}/proj/bias", _t(sd[f"{src}.proj.bias"]))

    def causal(src: str, dst: str):
        set_in(params, f"{dst}/conv/kernel", conv3d_kernel(sd[f"{src}.weight"]))
        set_in(params, f"{dst}/conv/bias", _t(sd[f"{src}.bias"]))

    def resample(src_seq: str, src_time: str, dst: str, spatial_idx: int):
        set_in(params, f"{dst}/conv_spatial/kernel",
               conv2d_as_3d_kernel(sd[f"{src_seq}.{spatial_idx}.weight"]))
        set_in(params, f"{dst}/conv_spatial/bias", _t(sd[f"{src_seq}.{spatial_idx}.bias"]))
        if f"{src_time}.weight" in sd:
            set_in(params, f"{dst}/time_conv/kernel", conv3d_kernel(sd[f"{src_time}.weight"]))
            set_in(params, f"{dst}/time_conv/bias", _t(sd[f"{src_time}.bias"]))

    # encoder
    causal("encoder.conv1", "encoder/conv1")
    n_stage = 0
    while f"encoder.downsamples.{n_stage}.downsamples.0.residual.0.gamma" in sd:
        n_stage += 1
    for i in range(n_stage):
        base = f"encoder.downsamples.{i}.downsamples"
        for j in range(num_res_blocks):
            res_block(f"{base}.{j}", f"encoder/down_{i}/block_{j}")
        if f"{base}.{num_res_blocks}.resample.1.weight" in sd:
            resample(f"{base}.{num_res_blocks}.resample",
                     f"{base}.{num_res_blocks}.time_conv",
                     f"encoder/down_{i}/downsample", 1)
    res_block("encoder.middle.0", "encoder/mid_block_1")
    attn("encoder.middle.1", "encoder/mid_attn")
    res_block("encoder.middle.2", "encoder/mid_block_2")
    set_in(params, "encoder/head_norm/gamma", _t(sd["encoder.head.0.gamma"]).reshape(-1))
    causal("encoder.head.2", "encoder/head_conv")

    causal("conv1", "conv1")
    causal("conv2", "conv2")

    # decoder
    causal("decoder.conv1", "decoder/conv1")
    res_block("decoder.middle.0", "decoder/mid_block_1")
    attn("decoder.middle.1", "decoder/mid_attn")
    res_block("decoder.middle.2", "decoder/mid_block_2")
    i = 0
    while f"decoder.upsamples.{i}.upsamples.0.residual.0.gamma" in sd:
        base = f"decoder.upsamples.{i}.upsamples"
        for j in range(num_res_blocks + 1):
            res_block(f"{base}.{j}", f"decoder/up_{i}/block_{j}")
        if f"{base}.{num_res_blocks + 1}.resample.1.weight" in sd:
            resample(f"{base}.{num_res_blocks + 1}.resample",
                     f"{base}.{num_res_blocks + 1}.time_conv",
                     f"decoder/up_{i}/upsample", 1)
        i += 1
    set_in(params, "decoder/head_norm/gamma", _t(sd["decoder.head.0.gamma"]).reshape(-1))
    causal("decoder.head.2", "decoder/head_conv")

    return {"params": params}


def convert_vae21_state_dict(sd: Mapping[str, Any], num_res_blocks: int = 2,
                             n_stages: int = 4) -> Dict:
    """Map a reference Wan2.1 VAE state_dict (wan/modules/vae.py naming —
    flat Sequential indices mixing ResidualBlocks and Resamples) onto
    yume_tpu.models.vae.WanVAE (arch='wan21') params."""
    params: Dict = {}

    def res_block(src: str, dst: str):
        set_in(params, f"{dst}/norm1/gamma", _t(sd[f"{src}.residual.0.gamma"]).reshape(-1))
        set_in(params, f"{dst}/conv1/conv/kernel", conv3d_kernel(sd[f"{src}.residual.2.weight"]))
        set_in(params, f"{dst}/conv1/conv/bias", _t(sd[f"{src}.residual.2.bias"]))
        set_in(params, f"{dst}/norm2/gamma", _t(sd[f"{src}.residual.3.gamma"]).reshape(-1))
        set_in(params, f"{dst}/conv2/conv/kernel", conv3d_kernel(sd[f"{src}.residual.6.weight"]))
        set_in(params, f"{dst}/conv2/conv/bias", _t(sd[f"{src}.residual.6.bias"]))
        if f"{src}.shortcut.weight" in sd:
            set_in(params, f"{dst}/shortcut/conv/kernel",
                   conv3d_kernel(sd[f"{src}.shortcut.weight"]))
            set_in(params, f"{dst}/shortcut/conv/bias", _t(sd[f"{src}.shortcut.bias"]))

    def attn(src: str, dst: str):
        set_in(params, f"{dst}/norm/gamma", _t(sd[f"{src}.norm.gamma"]).reshape(-1))
        set_in(params, f"{dst}/to_qkv/kernel", conv1x1_as_dense(sd[f"{src}.to_qkv.weight"]))
        set_in(params, f"{dst}/to_qkv/bias", _t(sd[f"{src}.to_qkv.bias"]))
        set_in(params, f"{dst}/proj/kernel", conv1x1_as_dense(sd[f"{src}.proj.weight"]))
        set_in(params, f"{dst}/proj/bias", _t(sd[f"{src}.proj.bias"]))

    def causal(src: str, dst: str):
        set_in(params, f"{dst}/conv/kernel", conv3d_kernel(sd[f"{src}.weight"]))
        set_in(params, f"{dst}/conv/bias", _t(sd[f"{src}.bias"]))

    def resample(src: str, dst: str):
        set_in(params, f"{dst}/conv_spatial/kernel",
               conv2d_as_3d_kernel(sd[f"{src}.resample.1.weight"]))
        set_in(params, f"{dst}/conv_spatial/bias", _t(sd[f"{src}.resample.1.bias"]))
        if f"{src}.time_conv.weight" in sd:
            set_in(params, f"{dst}/time_conv/kernel", conv3d_kernel(sd[f"{src}.time_conv.weight"]))
            set_in(params, f"{dst}/time_conv/bias", _t(sd[f"{src}.time_conv.bias"]))

    causal("encoder.conv1", "encoder/conv1")
    k = blk = 0
    for i in range(n_stages):
        for _ in range(num_res_blocks):
            res_block(f"encoder.downsamples.{k}", f"encoder/block_{blk}")
            k += 1
            blk += 1
        if i != n_stages - 1:
            resample(f"encoder.downsamples.{k}", f"encoder/downsample_{i}")
            k += 1
    res_block("encoder.middle.0", "encoder/mid_block_1")
    attn("encoder.middle.1", "encoder/mid_attn")
    res_block("encoder.middle.2", "encoder/mid_block_2")
    set_in(params, "encoder/head_norm/gamma", _t(sd["encoder.head.0.gamma"]).reshape(-1))
    causal("encoder.head.2", "encoder/head_conv")

    causal("conv1", "conv1")
    causal("conv2", "conv2")

    causal("decoder.conv1", "decoder/conv1")
    res_block("decoder.middle.0", "decoder/mid_block_1")
    attn("decoder.middle.1", "decoder/mid_attn")
    res_block("decoder.middle.2", "decoder/mid_block_2")
    k = blk = 0
    for i in range(n_stages):
        for _ in range(num_res_blocks + 1):
            res_block(f"decoder.upsamples.{k}", f"decoder/block_{blk}")
            k += 1
            blk += 1
        if i != n_stages - 1:
            resample(f"decoder.upsamples.{k}", f"decoder/upsample_{i}")
            k += 1
    set_in(params, "decoder/head_norm/gamma", _t(sd["decoder.head.0.gamma"]).reshape(-1))
    causal("decoder.head.2", "decoder/head_conv")

    return {"params": params}


# ---------------------------------------------------------------------------
# DiT torch → flax
# ---------------------------------------------------------------------------


def convert_dit_state_dict(sd: Mapping[str, Any], num_layers: int,
                           init_params: Dict | None = None,
                           verbose: bool = False,
                           report: Dict | None = None) -> Dict:
    """Map a reference WanModel state_dict (wan23/modules/model.py naming,
    sharded-safetensors layout loaded by `resume_checkpoint_yume`) onto
    yume_tpu.models.dit.WanDiT params.

    With ``init_params`` (a freshly-initialized ``{"params": ...}`` tree)
    the load is strict=False like the reference (fastvideo/utils/
    checkpoint.py:318-333): checkpoint keys overwrite init values, keys the
    checkpoint lacks keep their init values, and missing/unexpected keys
    are reported when ``verbose``. Without it, a missing key raises.
    """
    sd = _TrackedSD(normalize_torch_keys(sd), tolerant=init_params is not None)
    params: Dict = (jax.tree_util.tree_map(np.asarray, init_params["params"])
                    if init_params is not None else {})

    def _tol(fn):
        def wrapped(src: str, dst: str):
            try:
                fn(src, dst)
            except KeyError:
                if not sd.tolerant:
                    raise
        return wrapped

    @_tol
    def dense(src: str, dst: str):
        set_in(params, f"{dst}/kernel", dense_kernel(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            set_in(params, f"{dst}/bias", _t(sd[f"{src}.bias"]))

    @_tol
    def rms(src: str, dst: str):
        set_in(params, f"{dst}/weight", _t(sd[f"{src}.weight"]))

    @_tol
    def conv(src: str, dst: str):
        set_in(params, f"{dst}/kernel", conv3d_kernel(sd[f"{src}.weight"]))
        set_in(params, f"{dst}/bias", _t(sd[f"{src}.bias"]))

    for name in ("patch_embedding", "patch_embedding_2x", "patch_embedding_4x",
                 "patch_embedding_8x", "patch_embedding_16x", "patch_embedding_2x_f"):
        if f"{name}.weight" in sd:
            conv(name, name)

    dense("text_embedding.0", "text_embedding_0")
    dense("text_embedding.2", "text_embedding_2")
    dense("time_embedding.0", "time_embedding_0")
    dense("time_embedding.2", "time_embedding_2")
    dense("time_projection.1", "time_projection_1")
    if "img_emb.proj.1.weight" in sd:  # 14B CLIP branch (MLPProj)
        set_in(params, "img_emb_norm1/scale", _t(sd["img_emb.proj.0.weight"]))
        set_in(params, "img_emb_norm1/bias", _t(sd["img_emb.proj.0.bias"]))
        dense("img_emb.proj.1", "img_emb_1")
        dense("img_emb.proj.3", "img_emb_3")
        set_in(params, "img_emb_norm4/scale", _t(sd["img_emb.proj.4.weight"]))
        set_in(params, "img_emb_norm4/bias", _t(sd["img_emb.proj.4.bias"]))

    def leaf(dst: str, src_key: str):
        try:
            set_in(params, dst, _t(sd[src_key]))
        except KeyError:
            if not sd.tolerant:
                raise

    def block(src: str, dst: str):
        leaf(f"{dst}/modulation", f"{src}.modulation")
        for a in ("q", "k", "v", "o"):
            dense(f"{src}.self_attn.{a}", f"{dst}/self_attn/{a}")
        rms(f"{src}.self_attn.norm_q", f"{dst}/self_attn/norm_q")
        rms(f"{src}.self_attn.norm_k", f"{dst}/self_attn/norm_k")
        for a in ("q", "k", "v", "o"):
            dense(f"{src}.cross_attn.{a}", f"{dst}/cross_attn/{a}")
        rms(f"{src}.cross_attn.norm_q", f"{dst}/cross_attn/norm_q")
        rms(f"{src}.cross_attn.norm_k", f"{dst}/cross_attn/norm_k")
        for a in ("k_img", "v_img"):
            if f"{src}.cross_attn.{a}.weight" in sd:
                dense(f"{src}.cross_attn.{a}", f"{dst}/cross_attn/{a}")
        if f"{src}.cross_attn.norm_k_img.weight" in sd:
            rms(f"{src}.cross_attn.norm_k_img", f"{dst}/cross_attn/norm_k_img")
        if f"{src}.norm3.weight" in sd:
            leaf(f"{dst}/norm3/weight", f"{src}.norm3.weight")
            leaf(f"{dst}/norm3/bias", f"{src}.norm3.bias")
        dense(f"{src}.ffn.0", f"{dst}/ffn_0")
        dense(f"{src}.ffn.2", f"{dst}/ffn_2")

    for i in range(num_layers):
        block(f"blocks.{i}", f"blocks_{i}")
    if "sideblock.modulation" in sd:
        block("sideblock", "sideblock")
    if "mask_token" in sd:
        set_in(params, "mask_token", _t(sd["mask_token"]))

    leaf("head/modulation", "head.modulation")
    dense("head.head", "head/head")

    if report is not None:
        report["consumed"] = sorted(sd.consumed)
        report["missing"] = list(sd.missing)
        report["unexpected"] = sd.unexpected()
    if verbose:
        unexpected = sd.unexpected()
        print(f"[checkpoint] DiT load: {len(sd.consumed)} tensors consumed, "
              f"{len(sd.missing)} missing (kept init), "
              f"{len(unexpected)} unexpected (ignored)")
        for k in sd.missing[:20]:
            print(f"[checkpoint]   missing: {k}")
        for k in unexpected[:20]:
            print(f"[checkpoint]   unexpected: {k}")
    return {"params": params}


def convert_t5_state_dict(sd: Mapping[str, Any], num_layers: int) -> Dict:
    """Map the reference umT5 encoder state_dict (wan/modules/t5.py naming)
    onto yume_tpu.models.t5.T5Encoder params."""
    params: Dict = {}
    set_in(params, "token_embedding/embedding", _t(sd["token_embedding.weight"]))
    for i in range(num_layers):
        src, dst = f"blocks.{i}", f"blocks_{i}"
        set_in(params, f"{dst}/norm1/weight", _t(sd[f"{src}.norm1.weight"]))
        set_in(params, f"{dst}/norm2/weight", _t(sd[f"{src}.norm2.weight"]))
        for a in ("q", "k", "v", "o"):
            set_in(params, f"{dst}/attn/{a}/kernel", dense_kernel(sd[f"{src}.attn.{a}.weight"]))
        set_in(params, f"{dst}/ffn/gate/kernel", dense_kernel(sd[f"{src}.ffn.gate.0.weight"]))
        set_in(params, f"{dst}/ffn/fc1/kernel", dense_kernel(sd[f"{src}.ffn.fc1.weight"]))
        set_in(params, f"{dst}/ffn/fc2/kernel", dense_kernel(sd[f"{src}.ffn.fc2.weight"]))
        set_in(params, f"{dst}/pos_embedding",
               _t(sd[f"{src}.pos_embedding.embedding.weight"]))
    set_in(params, "norm/weight", _t(sd["norm.weight"]))
    return {"params": params}


def convert_clip_visual_state_dict(sd: Mapping[str, Any], num_layers: int = 32,
                                   prefix: str = "visual.") -> Dict:
    """Map the reference CLIP ViT-H visual tower (wan/modules/clip.py
    VisionTransformer naming) onto yume_tpu.models.clip.CLIPVisual params.
    Only the first num_layers-1 blocks matter (use_31_block output)."""
    params: Dict = {}

    def p(k):
        return sd[prefix + k]

    set_in(params, "patch_embedding/kernel",
           _t(p("patch_embedding.weight")).transpose(2, 3, 1, 0))
    set_in(params, "cls_embedding", _t(p("cls_embedding")))
    set_in(params, "pos_embedding", _t(p("pos_embedding")))
    set_in(params, "pre_norm/scale", _t(p("pre_norm.weight")))
    set_in(params, "pre_norm/bias", _t(p("pre_norm.bias")))
    for i in range(num_layers - 1):
        src, dst = f"transformer.{i}", f"blocks_{i}"
        for n, ours in (("norm1", "norm1"), ("norm2", "norm2")):
            set_in(params, f"{dst}/{ours}/scale", _t(p(f"{src}.{n}.weight")))
            set_in(params, f"{dst}/{ours}/bias", _t(p(f"{src}.{n}.bias")))
        set_in(params, f"{dst}/to_qkv/kernel", dense_kernel(p(f"{src}.attn.to_qkv.weight")))
        set_in(params, f"{dst}/to_qkv/bias", _t(p(f"{src}.attn.to_qkv.bias")))
        set_in(params, f"{dst}/proj/kernel", dense_kernel(p(f"{src}.attn.proj.weight")))
        set_in(params, f"{dst}/proj/bias", _t(p(f"{src}.attn.proj.bias")))
        set_in(params, f"{dst}/mlp_0/kernel", dense_kernel(p(f"{src}.mlp.0.weight")))
        set_in(params, f"{dst}/mlp_0/bias", _t(p(f"{src}.mlp.0.bias")))
        set_in(params, f"{dst}/mlp_2/kernel", dense_kernel(p(f"{src}.mlp.2.weight")))
        set_in(params, f"{dst}/mlp_2/bias", _t(p(f"{src}.mlp.2.bias")))
    return {"params": params}


def convert_xlm_roberta_state_dict(sd: Mapping[str, Any], num_layers: int) -> Dict:
    """Map the reference XLM-RoBERTa text tower (wan/modules/xlm_roberta.py
    naming, incl. the CLIP projection head of clip.py:303-326) onto
    yume_tpu.models.clip.XLMRobertaText params."""
    params: Dict = {}
    for emb in ("token_embedding", "type_embedding", "pos_embedding"):
        set_in(params, f"{emb}/embedding", _t(sd[f"{emb}.weight"]))
    set_in(params, "norm/scale", _t(sd["norm.weight"]))
    set_in(params, "norm/bias", _t(sd["norm.bias"]))
    for i in range(num_layers):
        src, dst = f"blocks.{i}", f"blocks_{i}"
        for a in ("q", "k", "v", "o"):
            set_in(params, f"{dst}_{a}/kernel", dense_kernel(sd[f"{src}.attn.{a}.weight"]))
            set_in(params, f"{dst}_{a}/bias", _t(sd[f"{src}.attn.{a}.bias"]))
        for n in ("norm1", "norm2"):
            set_in(params, f"{dst}_{n}/scale", _t(sd[f"{src}.{n}.weight"]))
            set_in(params, f"{dst}_{n}/bias", _t(sd[f"{src}.{n}.bias"]))
        set_in(params, f"{dst}_ffn0/kernel", dense_kernel(sd[f"{src}.ffn.0.weight"]))
        set_in(params, f"{dst}_ffn0/bias", _t(sd[f"{src}.ffn.0.bias"]))
        set_in(params, f"{dst}_ffn2/kernel", dense_kernel(sd[f"{src}.ffn.2.weight"]))
        set_in(params, f"{dst}_ffn2/bias", _t(sd[f"{src}.ffn.2.bias"]))
    if "head.0.weight" in sd:
        set_in(params, "head_0/kernel", dense_kernel(sd["head.0.weight"]))
        set_in(params, "head_2/kernel", dense_kernel(sd["head.2.weight"]))
    return {"params": params}


def convert_dino_state_dict(sd: Mapping[str, Any], depth: int = 12) -> Dict:
    """Map DINO ViT-S/16 pretrained weights (`dino_deitsmall16_pretrain.pth`,
    the checkpoint the reference discriminator's frozen projector loads at
    ADD/models/discriminator.py:145 via timm vit naming) onto
    yume_tpu.models.discriminator.DinoViT params. The final `norm`/`head`
    entries are unused — hook outputs are raw block activations
    (ADD/models/vit_utils.py:48-63)."""
    params: Dict = {}
    set_in(params, "cls_token", _t(sd["cls_token"]))
    set_in(params, "pos_embed", _t(sd["pos_embed"]))
    set_in(params, "patch_embed/kernel",
           _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    set_in(params, "patch_embed/bias", _t(sd["patch_embed.proj.bias"]))
    for i in range(depth):
        src, dst = f"blocks.{i}", f"blocks_{i}"
        for n in ("norm1", "norm2"):
            set_in(params, f"{dst}/{n}/scale", _t(sd[f"{src}.{n}.weight"]))
            set_in(params, f"{dst}/{n}/bias", _t(sd[f"{src}.{n}.bias"]))
        set_in(params, f"{dst}/qkv/kernel", dense_kernel(sd[f"{src}.attn.qkv.weight"]))
        set_in(params, f"{dst}/qkv/bias", _t(sd[f"{src}.attn.qkv.bias"]))
        set_in(params, f"{dst}/proj/kernel", dense_kernel(sd[f"{src}.attn.proj.weight"]))
        set_in(params, f"{dst}/proj/bias", _t(sd[f"{src}.attn.proj.bias"]))
        set_in(params, f"{dst}/mlp_0/kernel", dense_kernel(sd[f"{src}.mlp.fc1.weight"]))
        set_in(params, f"{dst}/mlp_0/bias", _t(sd[f"{src}.mlp.fc1.bias"]))
        set_in(params, f"{dst}/mlp_2/kernel", dense_kernel(sd[f"{src}.mlp.fc2.weight"]))
        set_in(params, f"{dst}/mlp_2/bias", _t(sd[f"{src}.mlp.fc2.bias"]))
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt state dict into flat numpy (CPU, weights_only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.float().numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def load_safetensors_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a (possibly sharded-with-index) safetensors checkpoint directory
    or file into a flat numpy state dict (equivalent of
    `resume_checkpoint_yume`'s index handling, checkpoint.py:285-337)."""
    import json

    from safetensors import safe_open

    files = []
    if os.path.isdir(path):
        idx = os.path.join(path, "diffusion_pytorch_model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            files = sorted({os.path.join(path, v) for v in weight_map.values()})
        else:
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".safetensors")
            )
    else:
        files = [path]
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as fh:
            for k in fh.keys():
                sd[k] = fh.get_tensor(k)
    return sd


# ---------------------------------------------------------------------------
# Export back to the reference torch layout (TPU-trained → torch-served)
# ---------------------------------------------------------------------------


def get_in(tree: Dict, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def export_dit_state_dict(params: Dict, num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_dit_state_dict`: a WanDiT param tree → the
    reference ``WanModel`` state-dict naming (wan23/modules/model.py /
    wan/modules/model.py), so TPU-trained weights can be served by the
    torch reference stack. Exact inverse: converting the export back
    reproduces the input tree bit-for-bit (float32)."""
    p = params.get("params", params)

    def have(path: str) -> bool:
        node = p
        for k in path.split("/"):
            if not isinstance(node, dict) or k not in node:
                return False
            node = node[k]
        return True

    sd: Dict[str, np.ndarray] = {}

    def dense(src: str, dst: str):
        # our [I, O] kernel → torch Linear [O, I]
        sd[f"{dst}.weight"] = np.asarray(get_in(p, f"{src}/kernel"),
                                         np.float32).T
        if have(f"{src}/bias"):
            sd[f"{dst}.bias"] = np.asarray(get_in(p, f"{src}/bias"),
                                           np.float32)

    def rms(src: str, dst: str):
        sd[f"{dst}.weight"] = np.asarray(get_in(p, f"{src}/weight"),
                                         np.float32)

    def conv(src: str, dst: str):
        # flax (kT, kH, kW, I, O) → torch Conv3d (O, I, kT, kH, kW)
        sd[f"{dst}.weight"] = np.asarray(get_in(p, f"{src}/kernel"),
                                         np.float32).transpose(4, 3, 0, 1, 2)
        sd[f"{dst}.bias"] = np.asarray(get_in(p, f"{src}/bias"), np.float32)

    def leaf(src: str, dst: str):
        sd[dst] = np.asarray(get_in(p, src), np.float32)

    for name in ("patch_embedding", "patch_embedding_2x", "patch_embedding_4x",
                 "patch_embedding_8x", "patch_embedding_16x",
                 "patch_embedding_2x_f"):
        if have(name):
            conv(name, name)

    dense("text_embedding_0", "text_embedding.0")
    dense("text_embedding_2", "text_embedding.2")
    dense("time_embedding_0", "time_embedding.0")
    dense("time_embedding_2", "time_embedding.2")
    dense("time_projection_1", "time_projection.1")
    if have("img_emb_1"):  # 14B CLIP branch (MLPProj)
        leaf("img_emb_norm1/scale", "img_emb.proj.0.weight")
        leaf("img_emb_norm1/bias", "img_emb.proj.0.bias")
        dense("img_emb_1", "img_emb.proj.1")
        dense("img_emb_3", "img_emb.proj.3")
        leaf("img_emb_norm4/scale", "img_emb.proj.4.weight")
        leaf("img_emb_norm4/bias", "img_emb.proj.4.bias")

    def block(src: str, dst: str):
        leaf(f"{src}/modulation", f"{dst}.modulation")
        for a in ("q", "k", "v", "o"):
            dense(f"{src}/self_attn/{a}", f"{dst}.self_attn.{a}")
        rms(f"{src}/self_attn/norm_q", f"{dst}.self_attn.norm_q")
        rms(f"{src}/self_attn/norm_k", f"{dst}.self_attn.norm_k")
        for a in ("q", "k", "v", "o"):
            dense(f"{src}/cross_attn/{a}", f"{dst}.cross_attn.{a}")
        rms(f"{src}/cross_attn/norm_q", f"{dst}.cross_attn.norm_q")
        rms(f"{src}/cross_attn/norm_k", f"{dst}.cross_attn.norm_k")
        for a in ("k_img", "v_img"):
            if have(f"{src}/cross_attn/{a}"):
                dense(f"{src}/cross_attn/{a}", f"{dst}.cross_attn.{a}")
        if have(f"{src}/cross_attn/norm_k_img"):
            rms(f"{src}/cross_attn/norm_k_img", f"{dst}.cross_attn.norm_k_img")
        if have(f"{src}/norm3"):
            leaf(f"{src}/norm3/weight", f"{dst}.norm3.weight")
            leaf(f"{src}/norm3/bias", f"{dst}.norm3.bias")
        dense(f"{src}/ffn_0", f"{dst}.ffn.0")
        dense(f"{src}/ffn_2", f"{dst}.ffn.2")

    for i in range(num_layers):
        block(f"blocks_{i}", f"blocks.{i}")
    if have("sideblock"):
        block("sideblock", "sideblock")
    if have("mask_token"):
        leaf("mask_token", "mask_token")

    leaf("head/modulation", "head.modulation")
    dense("head/head", "head.head")
    return sd


def save_sharded_safetensors(sd: Mapping[str, np.ndarray], out_dir: str,
                             n_shards: int = 3,
                             base: str = "diffusion_pytorch_model"):
    """Write a flat numpy state dict as the released-checkpoint layout:
    n sharded ``.safetensors`` + ``<base>.safetensors.index.json`` with a
    weight_map (what ``resume_checkpoint_yume`` consumes,
    fastvideo/utils/checkpoint.py:285-337)."""
    import json

    from safetensors.numpy import save_file

    keys = sorted(sd.keys())
    n_shards = max(1, min(n_shards, len(keys)))
    weight_map: Dict[str, str] = {}
    shards: list = [dict() for _ in range(n_shards)]
    total = 0
    for i, k in enumerate(keys):
        fname = f"{base}-{i % n_shards + 1:05d}-of-{n_shards:05d}.safetensors"
        arr = np.ascontiguousarray(sd[k])
        shards[i % n_shards][k] = arr
        weight_map[k] = fname
        total += arr.nbytes
    os.makedirs(out_dir, exist_ok=True)
    for s, tensors in enumerate(shards):
        save_file(tensors, os.path.join(
            out_dir, f"{base}-{s + 1:05d}-of-{n_shards:05d}.safetensors"))
    with open(os.path.join(out_dir, f"{base}.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)


# ---------------------------------------------------------------------------
# Orbax training-state checkpointing
# ---------------------------------------------------------------------------


class Checkpointer:
    """Persistent async checkpoint manager.

    ``save`` returns as soon as the on-device state is snapshotted; the
    serialization to disk overlaps subsequent train steps (the reference
    blocks training for its every-25-step FULL_STATE_DICT save,
    fastvideo/utils/checkpoint.py:223-258 — on TPU the save costs ~nothing
    on the step timeline). ``max_to_keep`` prunes old steps. Call ``close``
    (or ``wait``) before reading checkpoints back.
    """

    def __init__(self, path: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(path),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True))

    def save(self, step: int, state: Any):
        self._mngr.save(step, args=self._ocp.args.StandardSave(state))

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


def save_checkpoint(path: str, state: Any, step: int):
    """One-shot blocking sharded save of a train-state pytree (use
    `Checkpointer` inside training loops for async overlap)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    mngr = ocp.CheckpointManager(path)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def restore_checkpoint(path: str, state: Any, step: int | None = None) -> Any:
    """Restore a train-state pytree (latest step by default)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step() if step is None else step
    restored = mngr.restore(step, args=ocp.args.StandardRestore(state))
    mngr.close()
    return restored
