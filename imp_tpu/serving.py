"""AOT model export + serving.

The reference framework has no deployment story: inference happens only
inside the training harness's test loop
(``/root/reference/medmm/engine/trainer.py:550-581``), which needs the full
framework, the Python model definitions, and a live torch session.  For TPU
production serving imp_tpu AOT-exports the compiled eval forward with
``jax.export``: the artifact is a self-contained directory (a StableHLO
program + flax-serialized params + a JSON manifest + aux arrays) that a
serving host loads and calls with no model code and no tracing —
load → pad → call.

Because the exported program is StableHLO with static shapes, serving
inherits the training pipeline's masked fixed-shape contract: ragged inputs
are padded (bags to ``bag_pad`` alongside their boolean mask, batches to the
exported batch size by repeating rows) and pad outputs are dropped — the
same convention the trainers use (``engine/trainer.py:device_batch``).

Artifact layout (a directory)::

    manifest.json   input/output shapes + model/task metadata
    model.hlo       serialized ``jax.export.Exported`` (params are inputs)
    params.msgpack  flax-serialized parameter pytree
    aux.npz         data-derived constants (train-set ``omic_means``)

Caveats, by design:

* Export captures the *single-logical-device* eval program — multi-device
  meshes (dp/sp) are a training/eval-harness concern; serving replicates
  the artifact per replica.  ``export_trainer`` refuses sharded trainers.
* ``TPU.ATTENTION=flash`` lowers to a TPU-only Pallas kernel; export such a
  config with ``platforms=("tpu",)`` only.  The default Nyström path is
  plain XLA and exports cross-platform.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import threading
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
PROGRAM = "model.hlo"
PARAMS = "params.msgpack"
AUX = "aux.npz"

#: output field names per trainer kind, in exported order
_MBTRAIN_OUTPUTS = ("logits", "importance_path", "importance_omic")

#: batch fields that are replicated, not per-sample (mirrors
#: ``engine.trainer.REPLICATED_KEYS``; kept local so serving stays
#: importable without the training engine) — never sliced/chunked.
_REPLICATED_KEYS = ("omic_means",)


def survival_risk(logits: np.ndarray) -> np.ndarray:
    """logits → hazards → S → risk = −ΣS, the exact eval math of the
    reference (``/root/reference/medmm/evaluation/evaluator.py:369-382``)."""
    hazards = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
    S = np.cumprod(1.0 - hazards, axis=1)
    return -S.sum(axis=1)


def _sds(tree):
    import jax

    def leaf(x):
        dt = getattr(x, "dtype", None)  # no host<->device copies here
        if dt is None:
            x = np.asarray(x)
            dt = x.dtype
        return jax.ShapeDtypeStruct(np.shape(x), dt)

    return jax.tree_util.tree_map(leaf, tree)


def _example_eval_args(trainer) -> Tuple[Tuple, Dict, str]:
    """(args, batch_template, kind) for the trainer's jitted eval step.

    ``batch_template`` is the host-side batch dict (numpy) whose shapes and
    key set define the serving input contract.
    """
    from .engine.trainer import ARRAY_KEYS

    loader = getattr(trainer, "test_loader", None) or trainer.val_loader
    raw = next(iter(loader))
    if hasattr(trainer, "state") and hasattr(trainer, "_host_batch"):
        # MBTRAIN: eval_step(params, batch) -> (logits, imp_path, imp_omic)
        hb = trainer._host_batch(raw, train=False)
        return (trainer.state["params"], hb), hb, "mbtrain"
    # generic Trainer: eval_step(params, model_state, batch) -> logits
    hb = {k: np.asarray(v) for k, v in raw.items() if k in ARRAY_KEYS}
    return (trainer.params, trainer.model_state, hb), hb, "generic"


def export_trainer(
    trainer,
    out_dir: str,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """AOT-export ``trainer``'s eval forward to ``out_dir``.

    The trainer's own jitted ``_eval_step`` is exported verbatim, so the
    served program is bit-identical to what ``test()`` runs.  Params stay
    *inputs* of the program (saved alongside as msgpack) so the artifact
    survives fine-tuning: overwrite ``params.msgpack`` without re-export.
    """
    import jax
    from flax import serialization
    from jax import export as jexport

    n_dev = int(np.prod(list(trainer.mesh.shape.values())))
    if n_dev != 1:
        raise ValueError(
            f"export_trainer captures the single-logical-device eval program; "
            f"this trainer runs a {dict(trainer.mesh.shape)} mesh — rebuild "
            f"with TPU.MESH_SHAPE=(1,) for export (serving replicates the "
            f"artifact per replica instead of sharding one call)"
        )

    args, hb, kind = _example_eval_args(trainer)
    exported = jexport.export(
        trainer._eval_step,
        platforms=tuple(platforms) if platforms else None,
    )(*_sds(args))

    cfg = trainer.cfg
    manifest = {
        "format": 1,
        "kind": kind,
        "model": cfg.MODEL.NAME,
        "trainer": cfg.TRAINER.NAME,
        "task": cfg.TASK.NAME,
        "num_classes": int(trainer.num_classes),
        "batch_size": int(
            hb["img" if "img" in hb else "mol" if "mol" in hb else "label"].shape[0]
        ),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "outputs": list(_MBTRAIN_OUTPUTS) if kind == "mbtrain" else ["logits"],
        "batch_keys": {
            k: {"shape": list(np.shape(v)), "dtype": str(np.asarray(v).dtype)}
            for k, v in hb.items()
        },
    }
    if "img" in hb:
        manifest["bag_pad"] = int(hb["img"].shape[1])
        manifest["feat_dim"] = int(hb["img"].shape[2])
    if "mol" in hb:
        manifest["num_genes"] = int(hb["mol"].shape[1])

    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, PROGRAM), "wb") as f:
        f.write(exported.serialize())
    params = args[0] if kind == "mbtrain" else {
        "params": args[0], "model_state": args[1]
    }
    with open(osp.join(out_dir, PARAMS), "wb") as f:
        f.write(serialization.to_bytes(params))
    aux = {}
    if getattr(trainer, "omic_means", None) is not None:
        aux["omic_means"] = np.asarray(trainer.omic_means, np.float32)
    np.savez(osp.join(out_dir, AUX), **aux)
    with open(osp.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingModel:
    """A loaded export: pads ragged inputs, calls the AOT program, strips
    pad rows.  Construct via :func:`load_model`."""

    def __init__(self, out_dir: str):
        from flax import serialization
        from jax import export as jexport

        with open(osp.join(out_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        with open(osp.join(out_dir, PROGRAM), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(osp.join(out_dir, PARAMS), "rb") as f:
            blob = f.read()
        self._params = serialization.msgpack_restore(blob)
        self._aux = dict(np.load(osp.join(out_dir, AUX)))
        self.batch_size = self.manifest["batch_size"]
        self.bag_pad = self.manifest.get("bag_pad")
        # the AOT call itself is compiled code with internal buffers; one
        # lock serializes concurrent HTTP requests through it
        self._call_lock = threading.Lock()

    # -------------------------------------------------------------- #
    def _pad_bags(self, bags) -> Tuple[np.ndarray, np.ndarray]:
        """Stack ragged per-slide feature bags to [b, bag_pad, d] + mask.

        Bags longer than ``bag_pad`` are truncated (the training pipeline's
        ``DATALOADER.BAG_OVERFLOW`` policies apply at extraction time;
        serving sees already-extracted features).
        """
        n, d = self.bag_pad, self.manifest["feat_dim"]
        img = np.zeros((len(bags), n, d), np.float32)
        mask = np.zeros((len(bags), n), bool)
        for i, bag in enumerate(bags):
            bag = np.asarray(bag, np.float32)
            t = min(bag.shape[0], n)
            img[i, :t] = bag[:t]
            mask[i, :t] = True
        return img, mask

    def predict(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """Run the exported forward on a (possibly ragged) host batch.

        ``batch["img"]`` may be a list of per-slide ``[n_i, d]`` bags; other
        expected keys missing from ``batch`` are zero-filled (the ablation
        masks) or taken from the artifact's aux arrays (``omic_means``).
        Batches smaller than the exported batch size are wrap-padded and the
        pad rows dropped from every output.
        """
        keys = self.manifest["batch_keys"]
        hb = dict(batch)
        if "img" in keys and "img" in hb and isinstance(hb["img"], (list, tuple)):
            hb["img"], hb["img_mask"] = self._pad_bags(hb["img"])
        per_sample = [k for k in ("img", "mol", "label") if k in hb]
        if not per_sample:  # fall back to any non-replicated key
            per_sample = [k for k in hb if k != "omic_means"]
        b = int(np.shape(hb[per_sample[0]])[0])
        B = self.batch_size
        if b > B:
            raise ValueError(
                f"batch of {b} exceeds the exported batch size {B}; split it"
            )
        full = {}
        for k, spec in keys.items():
            if k in hb:
                v = np.asarray(hb[k]).astype(spec["dtype"])
            elif k in self._aux:
                v = self._aux[k].astype(spec["dtype"])
            else:  # absent ablation masks etc.: zeros at the exported shape
                v = np.zeros(spec["shape"], spec["dtype"])
            if list(v.shape) != spec["shape"]:
                if v.shape[1:] != tuple(spec["shape"][1:]):
                    raise ValueError(
                        f"batch['{k}'] trailing dims {v.shape[1:]} != exported "
                        f"{tuple(spec['shape'][1:])}"
                    )
                idx = np.arange(spec["shape"][0]) % v.shape[0]  # wrap-pad
                v = v[idx]
            full[k] = v
        with self._call_lock:
            if self.manifest["kind"] == "mbtrain":
                outs = self._exported.call(self._params, full)
                named = {
                    name: np.asarray(o)[:b]
                    for name, o in zip(self.manifest["outputs"], outs)
                    if o is not None
                }
            else:
                logits = self._exported.call(
                    self._params["params"], self._params["model_state"], full
                )
                named = {"logits": np.asarray(logits)[:b]}
        return named

    def predict_many(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """:meth:`predict` for batches of ANY size: per-sample inputs are
        split into exported-batch-size chunks, each chunk runs through the
        AOT program, and the outputs concatenate back in order.  Replicated
        inputs (e.g. an explicit ``omic_means``) pass through unchanged."""
        per_sample = [k for k in ("img", "mol", "label") if k in batch]
        if not per_sample:
            per_sample = [k for k in batch if k not in _REPLICATED_KEYS]
        b = len(batch[per_sample[0]])
        B = self.batch_size
        if b <= B:
            return self.predict(batch)

        def sliced(k, v, s, e):
            # replicated inputs (omic_means) pass through whole; KNOWN
            # per-sample keys must match the batch length exactly (a
            # malformed field, e.g. 7 labels for 8 samples, would otherwise
            # be silently broadcast to every chunk); unknown aux keys keep
            # the length heuristic (over HTTP everything arrives as JSON
            # lists, so len() is the only discriminator available there)
            if k in _REPLICATED_KEYS:
                return v
            n = len(v) if isinstance(v, (list, tuple)) else (
                np.asarray(v).shape[0] if np.ndim(v) else None
            )
            if k in ("img", "mol", "label") and n != b:
                raise ValueError(
                    f"per-sample input {k!r} has length {n}, expected the "
                    f"batch size {b}"
                )
            if isinstance(v, (list, tuple)):  # ragged bag lists
                return list(v[s:e]) if n == b else v
            v = np.asarray(v)
            return v[s:e] if v.ndim and v.shape[0] == b else v

        chunks = [
            self.predict({k: sliced(k, v, s, min(s + B, b))
                          for k, v in batch.items()})
            for s in range(0, b, B)
        ]
        return {
            k: np.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }

    def predict_risk(self, batch: Dict[str, Any]) -> np.ndarray:
        """Survival convenience: logits → hazards → S → risk = −ΣS, the exact
        eval math of the reference (``evaluator.py:369-382``)."""
        return survival_risk(self.predict_many(batch)["logits"])


def load_model(out_dir: str) -> ServingModel:
    return ServingModel(out_dir)


# =========================================================================
# HTTP serving host (stdlib-only; see tools/serve.py for the CLI)
# =========================================================================


def make_http_server(artifact_dir: str, host: str = "127.0.0.1",
                     port: int = 8500):
    """A threaded stdlib HTTP server around a loaded export.

    Endpoints (JSON in / JSON out):

    * ``GET /health`` — ``{"status": "ok", ...manifest summary...}``
    * ``POST /predict`` — body ``{"batch": {...}, "risk": false}``.
      ``batch["img"]`` may be a ragged list of per-slide ``[n_i, d]`` bags;
      other exported inputs are optional (zero-filled / aux-filled, see
      :meth:`ServingModel.predict`).  Any batch size is accepted
      (:meth:`ServingModel.predict_many` chunks to the exported size).
      Response: ``{"outputs": {name: nested lists}, "batch_size": b}``;
      with ``"risk": true`` a survival artifact also returns ``"risk"``.

    Pass ``port=0`` for an ephemeral port (read it back from
    ``server.server_address[1]``).  Call ``serve_forever()`` to run.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    model = ServingModel(artifact_dir)
    summary = {
        "status": "ok",
        "model": model.manifest["model"],
        "trainer": model.manifest["trainer"],
        "task": model.manifest["task"],
        "batch_size": model.batch_size,
        "bag_pad": model.bag_pad,
        "outputs": model.manifest["outputs"],
        "inputs": model.manifest["batch_keys"],
    }

    class Handler(BaseHTTPRequestHandler):
        server_version = "imp-tpu-serve/1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health"):
                self._reply(200, summary)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path.rstrip("/") != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                batch = req.get("batch") or {}
                if not batch:
                    raise ValueError("empty 'batch'")
                want_risk = bool(req.get("risk"))
                if want_risk and not str(
                    model.manifest["task"]
                ).lower().startswith("survival"):
                    raise ValueError(
                        f"'risk' is only defined for survival artifacts; "
                        f"this export's task is {model.manifest['task']!r}"
                    )
                outs = model.predict_many(batch)
                resp = {
                    "outputs": {k: v.tolist() for k, v in outs.items()},
                    "batch_size": int(next(iter(outs.values())).shape[0]),
                }
                if want_risk:
                    resp["risk"] = survival_risk(outs["logits"]).tolist()
                self._reply(200, resp)
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:  # bad input shapes/keys/json
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # genuine server-side failure
                import traceback
                traceback.print_exc()
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.serving_model = model  # handy for callers/tests
    return server
