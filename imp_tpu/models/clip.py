"""CLIP / PLIP encoders in flax — the pretrained feature stack
(reference vendored ``clip/model.py``), rebuilt TPU-first:

* :class:`VisionTransformer` — ViT-B/32 / B/16 image encoder (QuickGELU,
  pre-LN residual blocks, cls+positional embeddings, ln_post + projection;
  ref ``clip/model.py:202-236``), designed for **batched** jit inference —
  the reference extracts features one patch per forward
  (``tools/clip_feature.py:47-54``, the #1 throughput target);
* :class:`TextTransformer` — the causal text encoder with EOT pooling
  (ref ``clip/model.py:343-355``), used by PLIP prototype extraction and
  the CLIPOMIC baseline;
* :func:`convert_torch_clip_state` — torch state_dict -> flax params, so
  OpenAI / HF PLIP checkpoints load directly (no network needed at runtime).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CLIP_CONFIGS = {
    # embed_dim, image_resolution, vision_layers, vision_width, patch,
    # context_length, vocab_size, t_width, t_heads, t_layers
    "ViT-B/32": dict(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "ViT-B/16": dict(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    ),
    "ViT-L/14": dict(
        embed_dim=768, image_resolution=224, vision_layers=24, vision_width=1024,
        vision_patch_size=14, context_length=77, vocab_size=49408,
        transformer_width=768, transformer_heads=12, transformer_layers=12,
    ),
    "ViT-L/14@336px": dict(
        embed_dim=768, image_resolution=336, vision_layers=24, vision_width=1024,
        vision_patch_size=14, context_length=77, vocab_size=49408,
        transformer_width=768, transformer_heads=12, transformer_layers=12,
    ),
    # ModifiedResNet variants (ref ``clip/model.py:93-164``); vision_layers
    # is the per-stage Bottleneck count, vision_width the stem width
    "RN50": dict(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3),
        vision_width=64, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ),
    "RN101": dict(
        embed_dim=512, image_resolution=224, vision_layers=(3, 4, 23, 3),
        vision_width=64, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ),
    "RN50x4": dict(
        embed_dim=640, image_resolution=288, vision_layers=(4, 6, 10, 6),
        vision_width=80, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=640, transformer_heads=10,
        transformer_layers=12,
    ),
    "RN50x16": dict(
        embed_dim=768, image_resolution=384, vision_layers=(6, 8, 18, 8),
        vision_width=96, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=768, transformer_heads=12,
        transformer_layers=12,
    ),
    "RN50x64": dict(
        embed_dim=1024, image_resolution=448, vision_layers=(3, 15, 36, 10),
        vision_width=128, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=1024, transformer_heads=16,
        transformer_layers=12,
    ),
}


def available_models():
    """Names loadable by the flax towers (parity with the reference's
    ``clip.available_models()``, ``clip/clip.py``)."""
    return list(CLIP_CONFIGS)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width * 4, name="c_fc")(x)
        x = quick_gelu(x)
        return nn.Dense(self.width, name="c_proj")(x)


class CLIPAttention(nn.Module):
    """Packed-qkv MHA matching torch nn.MultiheadAttention param layout."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask: bool = False):
        b, n, d = x.shape
        dh = self.width // self.heads
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (d, 3 * d)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = x @ in_proj_w + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhld,bhsd->bhls", q * (dh**-0.5), k)
        if causal_mask:
            mask = jnp.tril(jnp.ones((n, n), dtype=bool))
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhls,bhsd->bhld", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal_mask: bool = False

    @nn.compact
    def __call__(self, x):
        x = x + CLIPAttention(self.width, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x), causal_mask=self.causal_mask
        )
        x = x + CLIPMLP(self.width, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        )
        return x


class VisionTransformer(nn.Module):
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] float
        b = x.shape[0]
        grid = self.input_resolution // self.patch_size
        # conv1: patchify (bias-free, stride = kernel = patch)
        scale = self.width**-0.5
        conv_w = self.param(
            "conv1_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.patch_size, self.patch_size, 3, self.width),
        )
        x = jax.lax.conv_general_dilated(
            x,
            conv_w,
            window_strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, grid, grid, width]
        x = x.reshape(b, grid * grid, self.width)

        cls = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,)
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (grid * grid + 1, self.width),
        )
        x = jnp.concatenate([jnp.tile(cls[None, None, :], (b, 1, 1)), x], axis=1)
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblocks_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim)
        )
        return x @ proj


class TextTransformer(nn.Module):
    """CLIP text encoder: token+positional embedding, causal transformer,
    ln_final, EOT-token pooling + projection (ref ``clip/model.py:343-355``)."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, text_tokens):  # [B, L] int32
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok[text_tokens] + pos[None, : text_tokens.shape[1]]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal_mask=True, name=f"resblocks_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at the EOT token (highest token id per sequence)
        eot = text_tokens.argmax(axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj


class ResNetBottleneck(nn.Module):
    """CLIP's anti-aliased Bottleneck (ref ``clip/model.py:10-53``): all convs
    stride 1; an avgpool does the striding after conv2 (and before the
    1x1 downsample conv). Inference-mode BatchNorm (running stats) — these
    towers are offline feature extractors here."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        inplanes = x.shape[-1]
        out_ch = self.planes * 4

        def bn(name):
            return nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name=name
            )

        h = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)))
        h = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride, self.stride), (self.stride, self.stride))
        h = bn("bn3")(nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h))

        identity = x
        if self.stride > 1 or inplanes != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride), (self.stride, self.stride)
                )
            identity = nn.Conv(
                out_ch, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (ref ``clip/model.py:56-91``). The reference
    runs full self-attention and keeps token 0; attending with ONLY the
    mean-token query computes the identical output at 1/(HW+1) the FLOPs."""

    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c**-0.5),
            (h * w + 1, c),
        )
        tokens = tokens + pos[None]
        q = nn.Dense(self.embed_dim, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj")(tokens)
        dh = self.embed_dim // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhld,bhsd->bhls", q * (dh**-0.5), k)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP's ResNet image tower (ref ``clip/model.py:93-164``): 3-conv
    stem with avgpool, 4 anti-aliased Bottleneck stages, attention pooling."""

    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] float
        def bn(name):
            return nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name=name
            )

        w = self.width
        x = nn.relu(bn("bn1")(nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(w // 2, (3, 3), padding=1, use_bias=False, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(w, (3, 3), padding=1, use_bias=False, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, (planes_mult, n_blocks) in enumerate(
            zip((1, 2, 4, 8), self.layers), start=1
        ):
            stride = 1 if stage == 1 else 2
            for i in range(n_blocks):
                x = ResNetBottleneck(
                    planes=w * planes_mult,
                    stride=stride if i == 0 else 1,
                    name=f"layer{stage}_{i}",
                )(x)

        return AttentionPool2d(
            embed_dim=w * 32,
            num_heads=self.heads,
            output_dim=self.output_dim,
            name="attnpool",
        )(x)


def build_vision_tower(name: str = "ViT-B/32"):
    c = CLIP_CONFIGS[name]
    if c["vision_patch_size"] is None:  # ModifiedResNet family
        return ModifiedResNet(
            layers=tuple(c["vision_layers"]),
            output_dim=c["embed_dim"],
            heads=c["vision_width"] * 32 // 64,
            input_resolution=c["image_resolution"],
            width=c["vision_width"],
        )
    return VisionTransformer(
        input_resolution=c["image_resolution"],
        patch_size=c["vision_patch_size"],
        width=c["vision_width"],
        layers=c["vision_layers"],
        heads=c["vision_width"] // 64,
        output_dim=c["embed_dim"],
    )


def build_text_tower(name: str = "ViT-B/32") -> TextTransformer:
    c = CLIP_CONFIGS[name]
    return TextTransformer(
        context_length=c["context_length"],
        vocab_size=c["vocab_size"],
        width=c["transformer_width"],
        heads=c["transformer_heads"],
        layers=c["transformer_layers"],
        embed_dim=c["embed_dim"],
    )


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _dense(w, b=None):
    out = {"kernel": np.asarray(w).T}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def convert_torch_clip_state(
    state: Dict[str, "np.ndarray"], name: str = "ViT-B/32"
) -> Tuple[Dict, Dict]:
    """Convert an OpenAI CLIP torch ``state_dict`` (tensors or numpy arrays)
    into (vision_params, text_params) for the flax towers."""

    def get(k):
        v = state[k]
        try:
            v = v.detach().cpu().numpy()
        except AttributeError:
            v = np.asarray(v)
        return v.astype(np.float32)

    c = CLIP_CONFIGS[name]
    vis: Dict = {}
    if "visual.conv1.weight" not in state:
        return {"params": vis}, _convert_text(state, get, c)
    if "visual.layer1.0.conv1.weight" in state:  # ModifiedResNet family
        return _convert_resnet(state, get, c), _convert_text(state, get, c)
    vis["conv1_kernel"] = get("visual.conv1.weight").transpose(2, 3, 1, 0)
    vis["class_embedding"] = get("visual.class_embedding")
    vis["positional_embedding"] = get("visual.positional_embedding")
    vis["proj"] = get("visual.proj")
    vis["ln_pre"] = {"scale": get("visual.ln_pre.weight"), "bias": get("visual.ln_pre.bias")}
    vis["ln_post"] = {"scale": get("visual.ln_post.weight"), "bias": get("visual.ln_post.bias")}
    for i in range(c["vision_layers"]):
        p = f"visual.transformer.resblocks.{i}."
        vis[f"resblocks_{i}"] = {
            "ln_1": {"scale": get(p + "ln_1.weight"), "bias": get(p + "ln_1.bias")},
            "ln_2": {"scale": get(p + "ln_2.weight"), "bias": get(p + "ln_2.bias")},
            "attn": {
                "in_proj_weight": get(p + "attn.in_proj_weight").T,
                "in_proj_bias": get(p + "attn.in_proj_bias"),
                "out_proj": _dense(
                    get(p + "attn.out_proj.weight"), get(p + "attn.out_proj.bias")
                ),
            },
            "mlp": {
                "c_fc": _dense(get(p + "mlp.c_fc.weight"), get(p + "mlp.c_fc.bias")),
                "c_proj": _dense(
                    get(p + "mlp.c_proj.weight"), get(p + "mlp.c_proj.bias")
                ),
            },
        }

    return {"params": vis}, _convert_text(state, get, c)


def _convert_resnet(state, get, c) -> Dict:
    """torch ``visual.*`` (ModifiedResNet) -> flax params + batch_stats."""

    def conv(k):
        return {"kernel": get(k).transpose(2, 3, 1, 0)}

    def bn_params(p):
        return {"scale": get(p + ".weight"), "bias": get(p + ".bias")}

    def bn_stats(p):
        return {"mean": get(p + ".running_mean"), "var": get(p + ".running_var")}

    params: Dict = {}
    stats: Dict = {}
    for j in (1, 2, 3):
        params[f"conv{j}"] = conv(f"visual.conv{j}.weight")
        params[f"bn{j}"] = bn_params(f"visual.bn{j}")
        stats[f"bn{j}"] = bn_stats(f"visual.bn{j}")
    for stage, n_blocks in enumerate(c["vision_layers"], start=1):
        for i in range(n_blocks):
            p = f"visual.layer{stage}.{i}."
            blk_p: Dict = {}
            blk_s: Dict = {}
            for j in (1, 2, 3):
                blk_p[f"conv{j}"] = conv(p + f"conv{j}.weight")
                blk_p[f"bn{j}"] = bn_params(p + f"bn{j}")
                blk_s[f"bn{j}"] = bn_stats(p + f"bn{j}")
            if p + "downsample.0.weight" in state:
                blk_p["downsample_conv"] = conv(p + "downsample.0.weight")
                blk_p["downsample_bn"] = bn_params(p + "downsample.1")
                blk_s["downsample_bn"] = bn_stats(p + "downsample.1")
            params[f"layer{stage}_{i}"] = blk_p
            stats[f"layer{stage}_{i}"] = blk_s
    ap = "visual.attnpool."
    params["attnpool"] = {
        "positional_embedding": get(ap + "positional_embedding"),
        "q_proj": _dense(get(ap + "q_proj.weight"), get(ap + "q_proj.bias")),
        "k_proj": _dense(get(ap + "k_proj.weight"), get(ap + "k_proj.bias")),
        "v_proj": _dense(get(ap + "v_proj.weight"), get(ap + "v_proj.bias")),
        "c_proj": _dense(get(ap + "c_proj.weight"), get(ap + "c_proj.bias")),
    }
    return {"params": params, "batch_stats": stats}


def _convert_text(state, get, c) -> Dict:
    txt: Dict = {}
    if "token_embedding.weight" in state:
        txt["token_embedding"] = get("token_embedding.weight")
        txt["positional_embedding"] = get("positional_embedding")
        txt["text_projection"] = get("text_projection")
        txt["ln_final"] = {
            "scale": get("ln_final.weight"), "bias": get("ln_final.bias")
        }
        # infer the layer count from the state dict (supports shrunken test
        # towers as well as the stock 12-layer CLIP text transformer)
        n_layers = 0
        while f"transformer.resblocks.{n_layers}.ln_1.weight" in state:
            n_layers += 1
        for i in range(n_layers or c["transformer_layers"]):
            p = f"transformer.resblocks.{i}."
            txt[f"resblocks_{i}"] = {
                "ln_1": {"scale": get(p + "ln_1.weight"), "bias": get(p + "ln_1.bias")},
                "ln_2": {"scale": get(p + "ln_2.weight"), "bias": get(p + "ln_2.bias")},
                "attn": {
                    "in_proj_weight": get(p + "attn.in_proj_weight").T,
                    "in_proj_bias": get(p + "attn.in_proj_bias"),
                    "out_proj": _dense(
                        get(p + "attn.out_proj.weight"), get(p + "attn.out_proj.bias")
                    ),
                },
                "mlp": {
                    "c_fc": _dense(get(p + "mlp.c_fc.weight"), get(p + "mlp.c_fc.bias")),
                    "c_proj": _dense(
                        get(p + "mlp.c_proj.weight"), get(p + "mlp.c_proj.bias")
                    ),
                },
            }
    return {"params": txt}
