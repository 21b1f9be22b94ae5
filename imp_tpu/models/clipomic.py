"""CLIPOMIC — CoOp-style omics prompt learner over the CLIP text encoder
(reference ``medmm/modeling/backbone/clipomic.py:21-123``).

Omics chunks (num_mol x len_mol) are projected to single context-token
embeddings and spliced between the SOS embedding and the ``. <EOS>`` suffix
of a dummy prompt, run through the CLIP text transformer, EOT-pooled, then
gated-attention pooled across chunks.  Batched per sample (the reference is
batch-1: it reshapes the omics vector across the batch dim).

CLIP weights load via ``imp_tpu.models.clip.convert_torch_clip_state``; the
fixed prompt token ids come from the BPE tokenizer when a vocab file is
available, else fall back to placeholder ids (only the embedding rows
differ — irrelevant for randomly-initialized training).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchLinear
from ..ops.blocks import Attn_Net_Gated, SNN_Block, masked_attention_pool
from .clip import ResidualAttentionBlock

# <|startoftext|> X . <|endoftext|> with the standard CLIP vocab
DEFAULT_PROMPT_IDS = (49406, 343, 269, 49407)


class CLIPOMIC(nn.Module):
    num_mol: int = 5
    len_mol: int = 200
    model_size_omic: str = "small"
    dropout: float = 0.25
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    prompt_ids: Tuple[int, ...] = DEFAULT_PROMPT_IDS

    @property
    def out_features(self):
        return {"small": 256, "big": 384}[self.model_size_omic]

    @nn.compact
    def __call__(self, x_omic, deterministic: bool = True):  # [B, G]
        b = x_omic.shape[0]
        size = {"small": [self.width, 512, 256], "big": [self.width, 512, 384]}[
            self.model_size_omic
        ]
        chunks = x_omic[:, : self.num_mol * self.len_mol].reshape(
            b, self.num_mol, self.len_mol
        )
        ctx = SNN_Block(self.width, dropout=0.25, name="omic_fc")(
            chunks, deterministic=deterministic
        )  # [B, num_mol, width]

        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        # clamp for shrunken test vocabularies; real CLIP vocab is unaffected
        ids = jnp.clip(
            jnp.asarray(self.prompt_ids, jnp.int32), 0, self.vocab_size - 1
        )
        prompt_embed = tok[ids]  # [4, width]
        prefix = prompt_embed[:1]  # SOS
        suffix = prompt_embed[2:]  # ". EOS"
        pad = tok[jnp.zeros((self.context_length - 4,), jnp.int32)]

        # [B, num_mol, L, width]: SOS, ctx, '.', EOS, pads
        seq = jnp.concatenate(
            [
                jnp.tile(prefix[None, None], (b, self.num_mol, 1, 1)),
                ctx[:, :, None, :],
                jnp.tile(suffix[None, None], (b, self.num_mol, 1, 1)),
                jnp.tile(pad[None, None], (b, self.num_mol, 1, 1)),
            ],
            axis=2,
        )
        x = (seq + pos[None, None]).reshape(b * self.num_mol, self.context_length, self.width)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal_mask=True, name=f"resblocks_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot_pos = 3  # EOS is the 4th token of the spliced prompt
        pooled = x[:, eot_pos, :]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.width),
        )
        h_omic = (pooled @ proj).reshape(b, self.num_mol, self.width)

        h = nn.relu(TorchLinear(size[1], name="fc")(h_omic))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        A, hh = Attn_Net_Gated(
            D=size[2], dropout=self.dropout > 0, name="attention_net"
        )(h, deterministic=deterministic)
        pooled2, _ = masked_attention_pool(A, hh)
        out = nn.relu(TorchLinear(size[2], name="rho")(pooled2[:, 0]))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
