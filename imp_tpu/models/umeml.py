"""UMEML — the fully-paired prototype model
(reference ``medmm/modeling/models/umeml.py:86-222``).

Batched, masked, fixed-shape: the bag enters as [B, N_pad, Dp] with a
boolean mask (the reference feeds the -10000-sentinel-padded bag straight
into ``path_net`` without stripping, ``umeml.py:168`` — a bug this rebuild
fixes by masking).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchLinear, TransLayer
from ..ops.blocks import BilinearFusion
from ..ops.modularity import compute_modularity_pair
from .layers import (
    Block,
    BottleneckAttentionBlock,
    PathProtoGenerator,
    proto_init,
    uniform01,
)


class UMEML(nn.Module):
    num_classes: int
    hidden: int = 256
    n_proto: int = 6
    n_reg: int = 3
    dropout: float = 0.25
    fusion: str = "concat"

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> Dict:
        hidden = self.hidden
        dropout = self.dropout
        n_proto = self.n_proto
        n_reg = self.n_reg
        fusion = self.fusion
        det = not train

        x_path = batch["img"]  # [B, N, Dp]
        mask = batch.get("img_mask")  # [B, N] or None
        x_omic = batch["mol"]  # [B, G]
        b = x_path.shape[0]
        g = x_omic.shape[-1]
        x_omic3 = x_omic.reshape(b, 1, g)
        g_omic_in = x_omic3  # detached clone in the reference; same values

        # bag / omics embeddings
        h = nn.relu(TorchLinear(hidden, name="path_net")(x_path))
        h_path_bag = nn.Dropout(dropout)(h, deterministic=det)
        if mask is not None:
            h_path_bag = h_path_bag * mask[..., None]

        ho = nn.relu(TorchLinear(hidden, name="omic_net")(x_omic3))
        h_omic_bag = nn.Dropout(dropout)(ho, deterministic=det)
        go = nn.relu(TorchLinear(hidden, name="g_omic_net")(g_omic_in))
        g_omic = nn.Dropout(dropout)(go, deterministic=det)
        h_omic_bag = jnp.concatenate([h_omic_bag, g_omic], axis=1)  # [B, 2, D]

        # prototype refinement (2 cross-attention blocks)
        p_proto0 = self.param("p_proto", proto_init(n_proto), (1, n_proto, hidden))
        p_proto = jnp.tile(p_proto0, (b, 1, 1))
        for i in range(2):
            p_proto = PathProtoGenerator(dim=hidden, name=f"proto_g_blocks_{i}")(
                h_path_bag, p_proto, key_valid=mask, deterministic=det
            )

        o_tok = self.param("o_encoder_token", uniform01, (1, 1, hidden))
        p_tok = self.param("p_encoder_token", uniform01, (1, 1, hidden))
        h_omic = jnp.concatenate([jnp.tile(o_tok, (b, 1, 1)), h_omic_bag], axis=1)
        for i in range(2):
            h_omic = Block(dim=hidden, name=f"omic_encoder_{i}")(
                h_omic, deterministic=det
            )
        h_path = jnp.concatenate([jnp.tile(p_tok, (b, 1, 1)), p_proto], axis=1)
        h_path = TransLayer(dim=hidden, name="path_decoder")(h_path, deterministic=det)
        h_omic = TransLayer(dim=hidden, name="omic_decoder")(h_omic, deterministic=det)
        h_path = nn.LayerNorm(epsilon=1e-5, name="layer_norm_p")(h_path)
        h_omic = nn.LayerNorm(epsilon=1e-5, name="layer_norm_o")(h_omic)

        t_path, f_path, t_omic, f_omic = BottleneckAttentionBlock(
            dim=hidden, n_reg=n_reg, name="bottleattn"
        )(h_path, h_omic, deterministic=det)

        modular_loss = jnp.zeros(())
        if train:
            modular_loss = compute_modularity_pair(
                (p_proto, h_omic), h_path_bag, valid=mask
            )

        if fusion == "bilinear":
            hfused = BilinearFusion(
                dim1=hidden, dim2=hidden, scale_dim1=8, scale_dim2=8, mmhid=hidden,
                name="mm",
            )(t_path[:, 0], t_omic[:, 0], deterministic=det)
        elif fusion == "concat":
            z = jnp.concatenate([t_path[:, 0], t_omic[:, 0]], axis=1)
            z = nn.relu(TorchLinear(hidden, name="mm_fc1")(z))
            hfused = nn.relu(TorchLinear(hidden, name="mm_fc2")(z))
        else:
            raise ValueError(f"Unknown fusion: {fusion}")

        logits = TorchLinear(self.num_classes, name="classifier")(hfused)
        return {"logits": logits, "modular_loss": modular_loss}
