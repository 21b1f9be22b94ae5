"""PLIP-text prototype extraction (reference
``extract_prototype_with_plip_train.py:35-112``), TPU-native.

The reference re-trains a 512->256 linear autoencoder on PLIP prompt
embeddings at every model construction; here the AE trains once under jit
(seconds) and the prototypes are cached to ``prototypes_plip.npy`` which
``MODEL.UMEML.PROTO_INIT=plip`` loads.

Inputs (zero-egress friendly):
* ``--embeddings X.npy`` — precomputed prompt CLS embeddings [N, 512] plus
  ``--prompts prompt.json`` mapping categories -> prompt lists (the
  embedding rows must follow the JSON order), OR
* ``--plip-dir`` — a local HuggingFace PLIP checkpoint; requires
  ``transformers`` tokenization and converts the text tower to flax.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def train_autoencoder(embeddings: np.ndarray, target_dim=256, num_epochs=100,
                      batch_size=8, lr=1e-4, seed=0):
    """Linear AE (512 -> 256 -> 512), MSE, Adam — same schedule as the
    reference (100 epochs, batch 8, lr 1e-4)."""
    import jax
    import jax.numpy as jnp
    import optax

    n, d = embeddings.shape
    key = jax.random.PRNGKey(seed)
    k_enc, k_dec, key = jax.random.split(key, 3)
    bound_e = 1.0 / np.sqrt(d)
    bound_d = 1.0 / np.sqrt(target_dim)
    params = {
        "enc_w": jax.random.uniform(k_enc, (d, target_dim), jnp.float32, -bound_e, bound_e),
        "enc_b": jnp.zeros((target_dim,)),
        "dec_w": jax.random.uniform(k_dec, (target_dim, d), jnp.float32, -bound_d, bound_d),
        "dec_b": jnp.zeros((d,)),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    x_all = jnp.asarray(embeddings, jnp.float32)

    @jax.jit
    def step(params, opt_state, xb):
        def loss_fn(p):
            z = xb @ p["enc_w"] + p["enc_b"]
            rec = z @ p["dec_w"] + p["dec_b"]
            return jnp.mean((rec - xb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for epoch in range(num_epochs):
        order = rng.permutation(n)
        total = 0.0
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            params, opt_state, loss = step(params, opt_state, x_all[idx])
            total += float(loss) * len(idx)
        if (epoch + 1) % 20 == 0:
            print(f"Epoch {epoch+1:03d}/{num_epochs}, MSE: {total/n:.6f}")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", default="prompts/prompt.json")
    ap.add_argument("--embeddings", default="", help="precomputed [N,512] .npy")
    ap.add_argument("--plip-dir", default="", help="local HF PLIP checkpoint dir")
    ap.add_argument("--out", default="prototypes_plip.npy")
    ap.add_argument("--target-dim", type=int, default=256)
    args = ap.parse_args()

    with open(args.prompts) as f:
        prompt_dict = json.load(f)
    categories = list(prompt_dict.keys())
    counts = [len(prompt_dict[c]) for c in categories]

    if args.embeddings:
        emb = np.load(args.embeddings).astype(np.float32)
    elif args.plip_dir:
        emb = encode_prompts_with_plip(args.plip_dir, prompt_dict)
    else:
        raise SystemExit("Provide --embeddings or --plip-dir")
    assert emb.shape[0] == sum(counts), (emb.shape, counts)

    params = train_autoencoder(emb, target_dim=args.target_dim)
    z = emb @ np.asarray(params["enc_w"]) + np.asarray(params["enc_b"])
    protos = []
    start = 0
    for c, n in zip(categories, counts):
        protos.append(z[start : start + n].mean(axis=0))
        start += n
    p_proto = np.stack(protos)[None]  # [1, n_proto, target_dim]
    np.save(args.out, p_proto.astype(np.float32))
    print(f"Saved prototypes {p_proto.shape} -> {args.out} (categories: {categories})")


def encode_prompts_with_plip(plip_dir: str, prompt_dict) -> np.ndarray:
    """Encode prompts with a local HF PLIP text encoder (CPU torch), taking
    the CLS (first) token of the last hidden state like the reference."""
    try:
        from transformers import CLIPProcessor, CLIPTextModel
        import torch
    except ImportError as e:  # pragma: no cover
        raise SystemExit(f"transformers/torch required for --plip-dir: {e}")
    processor = CLIPProcessor.from_pretrained(plip_dir)
    text_encoder = CLIPTextModel.from_pretrained(plip_dir).eval()
    all_prompts = [p for plist in prompt_dict.values() for p in plist]
    out = []
    with torch.no_grad():
        for i in range(0, len(all_prompts), 8):
            inputs = processor(
                text=all_prompts[i : i + 8], return_tensors="pt",
                padding=True, truncation=True,
            )
            hidden = text_encoder(**inputs).last_hidden_state
            out.append(hidden[:, 0, :].numpy())
    return np.concatenate(out, axis=0).astype(np.float32)


if __name__ == "__main__":
    main()
