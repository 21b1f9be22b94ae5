"""CLI drives of the offline ETL tools: kfold split writer, GDC molecular
transform, CPTAC test-label generation, and PLIP prototype extraction
(reference tools/kfold.py, tools/transform_molecular.py,
tools/generate_test_labels.py, extract_prototype_with_plip_train.py)."""

import importlib.util
import json
import os.path as osp
import sys

import numpy as np
import pandas as pd
import pytest

REPO = osp.join(osp.dirname(osp.abspath(__file__)), "..")


def _run_tool(name, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [f"{name}.py"] + argv)
    spec = importlib.util.spec_from_file_location(
        name, osp.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    mod.main()
    return mod


def test_kfold_cli_writes_disjoint_partition(tmp_path, monkeypatch):
    pytest.importorskip("sklearn")
    labels = tmp_path / "all_labels.csv"
    n = 23
    pd.DataFrame({
        "features": [f"s{i}.h5" for i in range(n)],
        "labels": np.arange(n) % 3,
        "survival_months": np.linspace(1, 60, n),
        "censorship": np.arange(n) % 2,
    }).to_csv(labels, index=False)
    out = tmp_path / "splits"

    _run_tool("kfold", ["--labels", str(labels), "--out", str(out),
                        "--task", "survival",
                        "--extra-cols", "survival_months", "censorship"],
              monkeypatch)

    seen_test = []
    for fold in range(1, 6):
        tr = pd.read_csv(out / f"survival_train_{fold}.csv")
        te = pd.read_csv(out / f"survival_test_{fold}.csv")
        assert list(tr.columns) == ["features", "labels",
                                    "survival_months", "censorship"]
        assert len(tr) + len(te) == n
        assert not set(tr["features"]) & set(te["features"])
        seen_test.extend(te["features"])
    # the 5 test folds partition the dataset
    assert sorted(seen_test) == sorted(f"s{i}.h5" for i in range(n))


def test_transform_molecular_cli(tmp_path, monkeypatch):
    # GDC tree: origin/<file_id>/<file_name> TSV (first line is a comment
    # row the tool skips), with genes g0..g9
    origin = tmp_path / "origin"
    (origin / "fid1").mkdir(parents=True)
    tsv = "# gdc comment line\ngene_name\tfpkm_uq_unstranded\n" + "".join(
        f"g{i}\t{float(i)}\n" for i in range(10)
    )
    (origin / "fid1" / "rna.tsv").write_text(tsv)
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps([{
        "file_id": "fid1", "file_name": "rna.tsv",
        "associated_entities": [
            {"entity_submitter_id": "TCGA-AB-1234-01A-11R"}
        ],
    }]))
    # variance ranking puts g9..g0 descending; top-k 4 keeps g9,g8,g7,g6
    var = tmp_path / "variance.csv"
    pd.DataFrame({"gene_name": [f"g{i}" for i in range(10)],
                  "variance": np.arange(10.0)}).to_csv(var, index=False)
    feats = tmp_path / "features"
    feats.mkdir()
    (feats / "TCGA-AB-1234-01Z-00-DX1.h5").write_bytes(b"")
    (feats / "TCGA-ZZ-9999-01Z-00-DX1.h5").write_bytes(b"")  # no RNA match
    out = tmp_path / "molecular"

    _run_tool("transform_molecular",
              ["--gdc-meta", str(meta), "--gene-variance", str(var),
               "--origin-dir", str(origin), "--feature-dir", str(feats),
               "--out-dir", str(out), "--top-k", "4"],
              monkeypatch)

    got = pd.read_csv(out / "TCGA-AB-1234-01Z-00-DX1.csv")
    assert sorted(got["gene_name"]) == ["g6", "g7", "g8", "g9"]
    assert got.set_index("gene_name")["fpkm_uq_unstranded"]["g9"] == 9.0
    assert not (out / "TCGA-ZZ-9999-01Z-00-DX1.csv").exists()


def test_generate_test_labels_survival(tmp_path, monkeypatch):
    from imp_tpu.data.labeling import DAYS_IN_MONTH

    meta = tmp_path / "cptac.csv"
    # CPTAC workbook column names (WSI_ID / OS / event); enough uncensored
    # rows that the reference's 4-quantile binning is well-defined
    pd.DataFrame({
        "WSI_ID": [f"C{i} " if i == 0 else f"C{i}" for i in range(10)],
        "OS": [365.0, 30.4, 100.0, 700.0, 1200.0, 250.0, 90.0, 400.0,
               800.0, 60.0],
        "event": [1, 0, 1, 1, 1, 1, 1, 1, 1, 0],  # death=1 -> censorship flips
    }).to_csv(meta, index=False)
    out = tmp_path / "labels"

    _run_tool("generate_test_labels",
              ["--meta", str(meta), "--task", "survival", "--out", str(out)],
              monkeypatch)

    df = pd.read_csv(out / "survival" / "survival_test.csv")
    assert list(df["patients"]) == [f"C{i}" for i in range(10)]  # stripped
    np.testing.assert_allclose(
        df["survival_months"][:2], [round(365.0 / DAYS_IN_MONTH, 2),
                                    round(30.4 / DAYS_IN_MONTH, 2)])
    assert list(df["censorship"][:2]) == [0, 1]
    # reference Survival_T binning: 4 quantile bins over the 8 uncensored
    # rows, every row assigned (clipped to the global min/max)
    assert set(df["labels"]) == {0, 1, 2, 3}
    assert df["labels"].notna().all()


def test_extract_prototypes_from_embeddings(tmp_path, monkeypatch):
    prompts = tmp_path / "prompt.json"
    prompts.write_text(json.dumps({
        "tumor": ["a", "b", "c"], "normal": ["d", "e"],
    }))
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5, 16)).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    out = tmp_path / "protos.npy"

    _run_tool("extract_prototypes",
              ["--prompts", str(prompts), "--embeddings",
               str(tmp_path / "emb.npy"), "--out", str(out),
               "--target-dim", "8"],
              monkeypatch)

    p = np.load(out)
    assert p.shape == (1, 2, 8) and p.dtype == np.float32
    assert np.isfinite(p).all()


def test_generate_test_labels_real_cptac_cli(tmp_path, monkeypatch):
    """CLI drive on the REAL reference workbook: all three tasks, xlsx read
    via the stdlib fallback (no openpyxl in this image)."""
    import os.path as osp

    xlsx = "/root/reference/DATASET/test/labels/survival/CPTAC.xlsx"
    if not osp.exists(xlsx):
        pytest.skip("reference data absent")
    out = tmp_path / "labels"
    for task in ("survival", "grading", "classification"):
        _run_tool("generate_test_labels",
                  ["--meta", xlsx, "--task", task, "--out", str(out)],
                  monkeypatch)
    surv = pd.read_csv(out / "survival" / "survival_test.csv")
    assert len(surv) == 191  # one OS-NaN row dropped
    assert set(surv["labels"]) == {0, 1, 2, 3}
    grad = pd.read_csv(out / "grading" / "grading_test.csv")
    clas = pd.read_csv(out / "classification" / "classification_test.csv")
    assert len(grad) == len(clas) == 192
    # all-glioblastoma G4 cohort (WT, or Mutant non-codel): grading is
    # Grade-4 (0) everywhere; 6-class splits G4 GBM (0) from G4 Astro (1)
    # — and must reproduce the authors' own precomputed Diag column
    assert set(grad["labels"]) == {0}
    assert list(clas["labels"].value_counts().sort_index()) == [181, 11]
    from imp_tpu.data.xlsx import read_xlsx

    meta = read_xlsx(xlsx)
    assert list(clas["labels"]) == [int(x) for x in meta["Diag"]]


def test_read_xlsx_edge_cells(tmp_path):
    """Stdlib OOXML reader edge cases: shared + inline strings, booleans,
    error cells (#N/A), blank gaps, >26-column refs."""
    import zipfile

    from imp_tpu.data.xlsx import read_xlsx

    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org'
        '/spreadsheetml/2006/main"><si><t>name</t></si><si><t>hello '
        'world</t></si></sst>'
    )
    # row 1 header: A1=shared[0] 'name', B1=inline 'num', AA1=inline 'far'
    # row 2: A2=shared[1], B2=3.5, AA2=int 7
    # row 3: A3 missing (gap), B3 bool true, AA3 error #N/A
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>num</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>num</t></is></c>'
        '<c r="AA1" t="inlineStr"><is><t>far</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>3.5</v></c>'
        '<c r="C2"><v>9</v></c>'
        '<c r="AA2"><v>7</v></c><c r="AB2"><v>42</v></c></row>'
        '<row r="3"><c r="B3" t="b"><v>1</v></c>'
        '<c r="AA3" t="e"><v>#N/A</v></c></row>'
        '</sheetData></worksheet>'
    )
    path = tmp_path / "edge.xlsx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_xlsx(str(path))
    assert list(df.columns)[0] == "name" and list(df.columns)[1] == "num"
    # duplicate headers mangle like pandas ('num', 'num.1'), blanks become
    # 'Unnamed: N', and TRAILING header-less data columns are kept
    assert list(df.columns)[2] == "num.1"
    assert list(df.columns)[26] == "far"
    assert list(df.columns)[27] == "Unnamed: 27"
    assert df["num.1"][0] == 9
    assert df["Unnamed: 27"][0] == 42
    assert df["name"][0] == "hello world"
    assert df["num"][0] == 3.5
    assert df["far"][0] == 7
    assert pd.isna(df["name"][1])  # gap cell -> NaN
    assert df["num"][1] is True or df["num"][1] == True  # noqa: E712
    assert pd.isna(df["far"][1])  # error cell (#N/A) -> NaN like read_excel
