"""MIL baselines: ABMIL + TransMIL (reference ``medmm/modeling/mil/``),
batched over slides with masks."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchLinear, TransLayer
from ..ops.blocks import PPEG, Attn_Net_Gated, masked_attention_pool, square_pad


class ABMIL_MODULE(nn.Module):
    """Gated-attention MIL pooling (reference ``mil/abmil.py:11-55``).
    out_features = size[2]."""

    path_input_dim: int = 512
    model_size_wsi: str = "small"
    dropout: float = 0.25

    @property
    def out_features(self):
        return {"small": 256, "big": 384}[self.model_size_wsi]

    @nn.compact
    def __call__(self, x_path, valid: Optional[jnp.ndarray] = None, deterministic=True):
        size = {
            "small": [self.path_input_dim, 512, 256],
            "big": [1024, 512, 384],
        }[self.model_size_wsi]
        h = nn.relu(TorchLinear(size[1], name="fc")(x_path))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        A, h = Attn_Net_Gated(D=size[2], dropout=self.dropout > 0, name="attention_net")(
            h, deterministic=deterministic
        )
        pooled, _ = masked_attention_pool(A, h, valid)  # [B, 1, 512]
        out = nn.relu(TorchLinear(size[2], name="rho")(pooled[:, 0]))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TransMIL_MODULE(nn.Module):
    """TransMIL: fc -> square-pad -> cls -> TransLayer/PPEG/TransLayer -> cls
    (reference ``mil/transmil.py:12-68``; its hardcoded .cuda() disappears).

    ``seq_axis``: sequence parallelism under shard_map — the bag arrives
    token-sharded [B, N/sp, D]; the cheap per-token fc runs on the shard,
    the tokens gather once (the attention is all-gather-KV anyway, so
    per-device memory is O(N·D) either way), square-pad/cls/PPEG run
    replicated (O(N) work), and the TransLayers band-parallelize the O(N²)
    attention + the qkv/out projections across the seq axis."""

    path_input_dim: int = 512
    seq_axis: object = None  # Optional[str]

    out_features: int = 512

    @nn.compact
    def __call__(self, x_path, valid: Optional[jnp.ndarray] = None, deterministic=True):
        h = nn.relu(TorchLinear(512, name="_fc1")(x_path))
        if valid is not None:
            h = h * valid[..., None]
        if self.seq_axis is not None:
            from ..ops.attention import gather_tokens_replicated

            h = gather_tokens_replicated(h, self.seq_axis, axis=1)
            if valid is not None:
                valid = gather_tokens_replicated(valid, self.seq_axis, axis=1)
        h, valid_sq, side = square_pad(h, valid)
        B = h.shape[0]
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, 512)
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        vmask = None
        if valid_sq is not None:
            vmask = jnp.concatenate([jnp.ones((B, 1), bool), valid_sq], axis=1)
        h = TransLayer(dim=512, seq_axis=self.seq_axis, name="layer1")(
            h, mask=vmask, deterministic=deterministic
        )
        h = PPEG(dim=512, name="pos_layer")(h, side, side)
        h = TransLayer(dim=512, seq_axis=self.seq_axis, name="layer2")(
            h, mask=vmask, deterministic=deterministic
        )
        h = nn.LayerNorm(epsilon=1e-5)(h)
        return h[:, 0]
