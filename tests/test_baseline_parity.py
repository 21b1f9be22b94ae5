"""Oracle forward-parity for the baseline model zoo: transplant the torch
reference's weights into our flax modules and compare eval forwards
(reference executed as a black-box oracle from /root/reference, same pattern
as test_umeml_gan_parity).

Covers MCAT, CMTA, Porpoise, HFB, ABMIL, TransMIL, SNN, SNNM
(ref ``medmm/modeling/{fusion,mil,backbone}/``).
"""

import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modeling():
    """Import the reference modeling package with dependency stubs."""
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # ref hardcodes .cuda()
        # ref BilinearFusion hardcodes torch.cuda.FloatTensor (blocks.py:176)
        torch.cuda.FloatTensor = torch.FloatTensor

    for name in ("timm", "timm.models"):
        sys.modules.setdefault(name, types.ModuleType(name))
    tl = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tl.DropPath = DropPath
    sys.modules.setdefault("timm.models.layers", tl)

    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")
    for n in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tv_tr, n, type(n, (), {"__init__": lambda self, *a, **k: None}))

    class _IM:
        BICUBIC = 3

    tv_tr.InterpolationMode = _IM
    tv.transforms = tv_tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tr)

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules.setdefault("ftfy", ftfy)
    import re as _re

    regex = types.ModuleType("regex")
    regex.IGNORECASE = _re.IGNORECASE
    regex.compile = lambda *a, **k: None
    regex.findall = lambda *a, **k: []
    sys.modules.setdefault("regex", regex)

    plip = types.ModuleType("extract_prototype_with_plip_train")
    plip.get_path_prorotypes = lambda: torch.zeros(1, 6, 256)
    sys.modules["extract_prototype_with_plip_train"] = plip

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import medmm.modeling  # noqa: F401

    return sys.modules["medmm.modeling"]


# ---------------------------------------------------------------------------
# torch -> flax weight converters
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x.detach().cpu().numpy(), np.float32)


def _lin(sd, name):
    out = {"kernel": _t(sd[name + ".weight"]).T}
    if name + ".bias" in sd:
        out["bias"] = _t(sd[name + ".bias"])
    return out


def _ln(sd, name):
    return {"scale": _t(sd[name + ".weight"]), "bias": _t(sd[name + ".bias"])}


def _gated_attn(sd, prefix):
    return {
        "attention_a": _lin(sd, prefix + ".attention_a.0"),
        "attention_b": _lin(sd, prefix + ".attention_b.0"),
        "attention_c": _lin(sd, prefix + ".attention_c"),
    }


def _translayer(sd, prefix):
    return {
        "LayerNorm_0": _ln(sd, prefix + ".norm"),
        "attn": {
            "to_qkv": {"kernel": _t(sd[prefix + ".attn.to_qkv.weight"]).T},
            "res_conv": _t(sd[prefix + ".attn.res_conv.weight"]),
            "to_out": _lin(sd, prefix + ".attn.to_out.0"),
        },
    }


def _ppeg(sd, prefix):
    return {
        "proj_kernel": _t(sd[prefix + ".proj.weight"]),
        "proj_bias": _t(sd[prefix + ".proj.bias"]),
        "proj1_kernel": _t(sd[prefix + ".proj1.weight"]),
        "proj1_bias": _t(sd[prefix + ".proj1.bias"]),
        "proj2_kernel": _t(sd[prefix + ".proj2.weight"]),
        "proj2_bias": _t(sd[prefix + ".proj2.bias"]),
    }


def _transformer_pg(sd, prefix, with_ppeg):
    out = {
        "cls_token": _t(sd[prefix + ".cls_token"]),
        "layer1": _translayer(sd, prefix + ".layer1"),
        "layer2": _translayer(sd, prefix + ".layer2"),
        "LayerNorm_0": _ln(sd, prefix + ".norm"),
    }
    if with_ppeg:
        out["pos_layer"] = _ppeg(sd, prefix + ".pos_layer")
    return out


def _mha(sd, prefix):
    return {
        "in_proj_weight": _t(sd[prefix + ".in_proj_weight"]).T,
        "in_proj_bias": _t(sd[prefix + ".in_proj_bias"]),
        "out_proj": _lin(sd, prefix + ".out_proj"),
    }


def _sig_networks(sd, prefix, n_sigs, n_layers, block="TorchLinear_0"):
    return {
        f"sig{i}_fc{j}": {block: _lin(sd, f"{prefix}.{i}.{j}.0")}
        for i in range(n_sigs)
        for j in range(n_layers)
    }


def _bilinear_mm(sd, prefix):
    return {
        name: _lin(sd, f"{prefix}.{name}.0")
        for name in (
            "linear_h1", "linear_z1", "linear_o1",
            "linear_h2", "linear_z2", "linear_o2",
            "encoder1", "encoder2",
        )
    }


def _params(p):
    import jax
    import jax.numpy as jnp

    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}


def _rand_inputs(n=30, g=1000, seed=5):
    rng = np.random.default_rng(seed)
    bag = rng.normal(size=(1, n, 512)).astype(np.float32)
    omic = rng.lognormal(size=(1, g)).astype(np.float32)
    return bag, omic


def _check(got, want, rtol=2e-4, atol=2e-4):
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=rtol, atol=atol
    )


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_abmil_forward_parity(ref_modeling):
    from medmm.modeling.mil.abmil import ABMIL_MODULE as RefABMIL

    from imp_tpu.models.mil import ABMIL_MODULE

    torch.manual_seed(0)
    ref = RefABMIL().eval()
    sd = ref.state_dict()
    bag, _ = _rand_inputs()
    with torch.no_grad():
        want = _t(ref(torch.tensor(bag)))

    import jax.numpy as jnp

    params = _params(
        {
            "fc": _lin(sd, "attention_net.0"),
            "attention_net": _gated_attn(sd, "attention_net.3"),
            "rho": _lin(sd, "rho.0"),
        }
    )
    got = ABMIL_MODULE().apply(params, jnp.asarray(bag), deterministic=True)
    _check(got, want)

    # padded + masked == unpadded
    pad = np.concatenate([bag, np.zeros((1, 10, 512), np.float32)], axis=1)
    valid = jnp.asarray(np.arange(40)[None, :] < 30)
    got_m = ABMIL_MODULE().apply(
        params, jnp.asarray(pad), valid=valid, deterministic=True
    )
    _check(got_m, want)


def test_transmil_forward_parity(ref_modeling):
    from medmm.modeling.mil.transmil import TransMIL_MODULE as RefTransMIL

    from imp_tpu.models.mil import TransMIL_MODULE

    torch.manual_seed(0)
    ref = RefTransMIL().eval()
    sd = ref.state_dict()
    bag, _ = _rand_inputs(n=30)
    with torch.no_grad():
        want = _t(ref(torch.tensor(bag)))

    import jax.numpy as jnp

    params = _params(
        {
            "cls_token": _t(sd["cls_token"]),
            "_fc1": _lin(sd, "_fc1.0"),
            "pos_layer": _ppeg(sd, "pos_layer"),
            "layer1": _translayer(sd, "layer1"),
            "layer2": _translayer(sd, "layer2"),
            "LayerNorm_0": _ln(sd, "norm"),
        }
    )
    got = TransMIL_MODULE().apply(params, jnp.asarray(bag), deterministic=True)
    _check(got, want, rtol=1e-3, atol=1e-3)  # Nyström pinv iteration chain


def test_snn_forward_parity(ref_modeling):
    from medmm.modeling.backbone.snn import SNN as RefSNN

    from imp_tpu.models.backbone import SNN

    torch.manual_seed(0)
    ref = RefSNN().eval()
    sd = ref.state_dict()
    _, omic = _rand_inputs()
    with torch.no_grad():
        want = _t(ref(torch.tensor(omic)))

    import jax.numpy as jnp

    params = _params(
        {
            f"fc_omic_{i}": {"MaxLinear_0": _lin(sd, f"fc_omic.{i}.0")}
            for i in range(4)
        }
    )
    got = SNN().apply(params, jnp.asarray(omic), deterministic=True)
    _check(got, want)


def test_snnm_forward_parity(ref_modeling):
    from medmm.modeling.backbone.snnm import SNN_M as RefSNNM

    from imp_tpu.models.backbone import SNN_M

    torch.manual_seed(0)
    ref = RefSNNM().eval()
    sd = ref.state_dict()
    _, omic = _rand_inputs()
    with torch.no_grad():
        want = _t(ref(torch.tensor(omic)))

    import jax.numpy as jnp

    p = {
        f"fc_omic_{i}": {"MaxLinear_0": _lin(sd, f"fc_omic.{i}.0")}
        for i in range(4)
    }
    p["fc"] = _lin(sd, "attention_net.0")
    p["attention_net"] = _gated_attn(sd, "attention_net.3")
    p["rho"] = _lin(sd, "rho.0")
    got = SNN_M().apply(_params(p), jnp.asarray(omic), deterministic=True)
    _check(got, want)


def test_porpoise_forward_parity(ref_modeling):
    from medmm.modeling.fusion.porpoise import Porpoise as RefPorpoise

    from imp_tpu.models.fusion import Porpoise

    torch.manual_seed(0)
    ref = RefPorpoise(fusion="bilinear", omic_input_dim=1000).eval()
    sd = ref.state_dict()
    bag, omic = _rand_inputs()
    with torch.no_grad():
        want = _t(ref(torch.tensor(bag), torch.tensor(omic)))

    import jax.numpy as jnp

    p = {
        "fc_h": _lin(sd, "attention_net_h.1"),
        "attention_net_h": _gated_attn(sd, "attention_net_h.4"),
        "rho_h": _lin(sd, "rho_h.0"),
        "fc_omic_0": {"TorchLinear_0": _lin(sd, "fc_omic.0.0")},
        "fc_omic_1": {"TorchLinear_0": _lin(sd, "fc_omic.1.0")},
        "mm": _bilinear_mm(sd, "mm"),
    }
    got = Porpoise(fusion="bilinear").apply(
        _params(p), jnp.asarray(bag), jnp.asarray(omic), deterministic=True
    )
    _check(got, want)


def test_hfb_forward_parity(ref_modeling):
    from medmm.modeling.fusion.hfb import HFB as RefHFB

    from imp_tpu.models.fusion import HFB

    torch.manual_seed(0)
    ref = RefHFB().eval()
    sd = ref.state_dict()
    bag, omic = _rand_inputs()
    with torch.no_grad():
        want = _t(ref(torch.tensor(bag), torch.tensor(omic)))

    import jax.numpy as jnp

    def subnet(prefix):
        return {
            "enc1": _lin(sd, prefix + ".encoder.0.0"),
            "enc2": _lin(sd, prefix + ".encoder.1.0"),
        }

    p = {
        "encoder_gene": subnet("encoder_gene"),
        "encoder_path": subnet("encoder_path"),
        "encoder_cona": subnet("encoder_cona"),
        "attention_net1": _gated_attn(sd, "attention_net1"),
        "attention_net2": _gated_attn(sd, "attention_net2"),
        "Linear_gene": _lin(sd, "Linear_gene"),
        "Linear_path": _lin(sd, "Linear_path"),
        "Linear_cona": _lin(sd, "Linear_cona"),
        "Linear_gene_a": _lin(sd, "Linear_gene_a"),
        "attention_fc": _lin(sd, "attention.0"),
        "Linear_encoder": _lin(sd, "Linear_encoder"),
        "norm": _ln(sd, "norm"),
    }
    variables = _params(p)
    variables["batch_stats"] = {
        "norm": {
            "mean": np.asarray(_t(sd["norm.running_mean"])),
            "var": np.asarray(_t(sd["norm.running_var"])),
        }
    }
    got = HFB().apply(
        variables, jnp.asarray(bag), jnp.asarray(omic), deterministic=True
    )
    _check(got, want)


def test_mcat_forward_parity(ref_modeling):
    from medmm.modeling.fusion.mcat import MCAT as RefMCAT

    from imp_tpu.models.fusion import MCAT

    torch.manual_seed(0)
    ref = RefMCAT(fusion="concat", omic_sizes=[200] * 5).eval()
    sd = ref.state_dict()
    bag, omic = _rand_inputs()
    with torch.no_grad():
        # reference runs unbatched: x_path [N, 512], x_omic [1, 1000]
        want, ref_scores = ref(torch.tensor(bag[0]), torch.tensor(omic))
    want = _t(want)

    import jax.numpy as jnp

    p = {
        "wsi_net": _lin(sd, "wsi_net.0"),
        "sig_networks": _sig_networks(sd, "sig_networks", 5, 2),
        "coattn": _mha(sd, "coattn"),
        "path_attention_head": _gated_attn(sd, "path_attention_head"),
        "path_rho": _lin(sd, "path_rho.0"),
        "omic_attention_head": _gated_attn(sd, "omic_attention_head"),
        "omic_rho": _lin(sd, "omic_rho.0"),
        "mm_fc1": _lin(sd, "mm.0"),
        "mm_fc2": _lin(sd, "mm.2"),
    }
    for branch in ("path", "omic"):
        for i in range(2):
            pre = f"{branch}_transformer.layers.{i}"
            p[f"{branch}_transformer_{i}"] = {
                "self_attn": _mha(sd, pre + ".self_attn"),
                "linear1": _lin(sd, pre + ".linear1"),
                "linear2": _lin(sd, pre + ".linear2"),
                "norm1": _ln(sd, pre + ".norm1"),
                "norm2": _ln(sd, pre + ".norm2"),
            }
    got, _ = MCAT(fusion="concat").apply(
        _params(p), jnp.asarray(bag), jnp.asarray(omic), deterministic=True
    )
    _check(got, want, rtol=5e-4, atol=5e-4)


def test_cmta_forward_parity(ref_modeling):
    from medmm.modeling.fusion.cmta import CMTA as RefCMTA

    from imp_tpu.models.fusion import CMTA

    torch.manual_seed(0)
    ref = RefCMTA(fusion="concat", omic_sizes=[200] * 5).eval()
    sd = ref.state_dict()
    bag, omic = _rand_inputs(n=30)
    with torch.no_grad():
        ref_out = ref(torch.tensor(bag), torch.tensor(omic))

    import jax.numpy as jnp

    p = {
        "pathomics_fc_0": _lin(sd, "pathomics_fc.0"),
        "pathomics_fc_1": _lin(sd, "pathomics_fc.3"),
        "genomics_fc": _sig_networks(sd, "genomics_fc", 5, 2),
        "pathomics_encoder": _transformer_pg(sd, "pathomics_encoder", True),
        "pathomics_decoder": _transformer_pg(sd, "pathomics_decoder", True),
        "genomics_encoder": _transformer_pg(sd, "genomics_encoder", False),
        "genomics_decoder": _transformer_pg(sd, "genomics_decoder", False),
        "P_in_G_Att": _mha(sd, "P_in_G_Att"),
        "G_in_P_Att": _mha(sd, "G_in_P_Att"),
        "mm_fc1": _lin(sd, "mm.0"),
        "mm_fc2": _lin(sd, "mm.2"),
    }
    got, cls_tokens = CMTA(fusion="concat").apply(
        _params(p), jnp.asarray(bag), jnp.asarray(omic), deterministic=True
    )
    want, ref_cls = ref_out
    _check(got, _t(want), rtol=1e-3, atol=1e-3)  # two Nyström stacks in series
    for k in cls_tokens:
        _check(cls_tokens[k], _t(ref_cls[k]), rtol=1e-3, atol=1e-3)
