"""Smoke-test for the one-command real-data parity driver (VERDICT r2 item
8): on synthetic fixtures, scripts/parity_run.py must chain retrieval ->
train -> dual-corpus test and record the accuracy rows in
parity_results.json — the exact command that produces the BASELINE.md
accuracy rows when the USPTO artifacts + SciBERT checkpoint exist."""

import json
import os
import sys

import pytest

from fixtures import make_condition_data, make_retro_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY_ENC = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
}
TINY_DEC = dict(TINY_ENC, vocab_size=320, max_position_embeddings=32)


@pytest.mark.slow
def test_parity_run_rcr_smoke(tmp_path):
    import parity_run

    root = make_condition_data(str(tmp_path / "data"))
    for name, cfg in (("enc.json", TINY_ENC), ("dec.json", TINY_DEC)):
        with open(os.path.join(root, name), "w") as f:
            json.dump(cfg, f)
    save = str(tmp_path / "out")
    override = " ".join([
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "text",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--max_length", "64", "--max_dec_length", "16",
        "--batch_size", "8", "--test_batch_size", "8",
        "--epochs", "1", "--num_beams", "3", "--num_neighbors", "2",
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])
    rc = parity_run.main([
        "--recipe", "RCR", "--data_path", root,
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--save_path", save, "--override", override,
    ])
    assert rc == 0
    # neighbor files were built by the fingerprint retriever leg
    for split in ("train", "val", "test"):
        assert os.path.exists(os.path.join(save, "nn", f"{split}.json"))
    with open(os.path.join(save, "parity_results.json")) as f:
        results = json.load(f)
    assert results["recipe"] == "RCR"
    accs = results["accuracy"]
    # dual-corpus reporting: full + gold-removed (reference README.md:68-71)
    assert isinstance(accs, list) and len(accs) == 2
    for acc in accs:
        assert set(int(k) for k in acc) == {1, 3, 5, 10, 15}
        assert all(0.0 <= v <= 1.0 for v in acc.values())


RETRO_KS = {1, 2, 3, 5, 10, 20}


@pytest.mark.slow
def test_parity_run_retrosyn_tf_smoke(tmp_path):
    """Template-free retro recipe (reference train_RetroSyn_tf.sh) through
    the same one-command driver: retrieval leg + seq2seq train + dual test."""
    import parity_run

    root = make_retro_data(str(tmp_path / "data"))
    enc = dict(TINY_ENC, vocab_size=700)   # joint smiles(+590)+text vocab
    dec = dict(TINY_DEC, vocab_size=600)   # assets/smiles_vocab.txt (590)
    for name, cfg in (("enc.json", enc), ("dec.json", dec)):
        with open(os.path.join(root, name), "w") as f:
            json.dump(cfg, f)
    save = str(tmp_path / "out")
    override = " ".join([
        "--encoder", os.path.join(root, "enc.json"),
        "--decoder", os.path.join(root, "dec.json"),
        "--encoder_tokenizer", "smiles_text",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--max_length", "64", "--max_dec_length", "16",
        "--batch_size", "8", "--test_batch_size", "8",
        "--epochs", "1", "--num_beams", "3", "--num_neighbors", "2",
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])
    rc = parity_run.main([
        "--recipe", "RetroSyn_tf", "--data_path", root,
        "--valid_file", "valid.csv",
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--save_path", save, "--override", override,
    ])
    assert rc == 0
    for split in ("train", "val", "test"):
        assert os.path.exists(os.path.join(save, "nn", f"{split}.json"))
    with open(os.path.join(save, "parity_results.json")) as f:
        results = json.load(f)
    assert results["recipe"] == "RetroSyn_tf"
    accs = results["accuracy"]
    assert isinstance(accs, list) and len(accs) == 2
    for acc in accs:
        assert set(int(k) for k in acc) == RETRO_KS
        assert all(0.0 <= v <= 1.0 for v in acc.values())


@pytest.mark.slow
def test_parity_run_retrosyn_tb_smoke(tmp_path):
    """Template-based retro recipe (reference train_RetroSyn_tb.sh): the
    driver must itself extract/label templates (native engine) from the
    mapped task CSVs, then train the atom/bond heads and score via the
    template decoder."""
    import pandas as pd

    import parity_run
    from textreact_tpu.chem import parse_smiles
    from textreact_tpu.templates.native_extractor import demapped_canonical
    from textreact_tpu.templates.processor import canonical_product

    # four mapped reaction families (same set the full-cycle test uses)
    rxns = [
        "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
        "[CH3:1][C:2](=[O:3])[O:6][CH3:5]",
        "[CH3:1][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
        "[CH3:1][C:2](=[O:3])[NH:5][CH3:6]",
        "[Br:9][CH2:1][CH3:2].[NH2:3][CH3:4]>>[CH2:1]([CH3:2])[NH:3][CH3:4]",
        "[CH3:1][CH:2]([OH:5])[CH3:3]>>[CH3:1][CH:2]=[CH2:3]",
    ]
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    all_ids = []
    for split, reps in (("train", 6), ("val", 1), ("test", 1)):
        rows = []
        for i, rxn in enumerate(rxns * reps):
            rid = f"{split}{i}"
            all_ids.append(rid)
            reactants = rxn.split(">")[0]
            rows.append({
                "id": rid, "rxn_smiles": rxn,
                "product_smiles": canonical_product(
                    rxn.split(">")[-1], engine="native")[0],
                "reactant_smiles": demapped_canonical(parse_smiles(reactants)),
            })
        pd.DataFrame(rows).to_csv(os.path.join(root, f"{split}.csv"),
                                  index=False)
    pd.DataFrame([{"id": rid, "heading_text": "",
                   "paragraph_text": f"the product was prepared from "
                                     f"compound {rid} by heating."}
                  for rid in all_ids]).to_csv(
        os.path.join(root, "corpus.csv"), index=False)
    from fixtures import write_text_vocab
    write_text_vocab(os.path.join(root, "text_vocab.txt"))

    enc = dict(TINY_ENC, vocab_size=700)
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(enc, f)
    save = str(tmp_path / "out")
    override = " ".join([
        "--encoder", os.path.join(root, "enc.json"),
        "--encoder_tokenizer", "smiles_text",
        "--vocab_file", "textreact_tpu/assets/smiles_vocab.txt",
        "--text_vocab_file", os.path.join(root, "text_vocab.txt"),
        "--max_length", "64",
        "--batch_size", "8", "--test_batch_size", "8",
        "--epochs", "1", "--num_neighbors", "2",
        "--compute_dtype", "float32", "--dp_size", "2",
        "--log_every", "1", "--debug",
    ])
    rc = parity_run.main([
        "--recipe", "RetroSyn_tb", "--data_path", root,
        "--corpus_file", os.path.join(root, "corpus.csv"),
        "--save_path", save, "--override", override,
    ])
    assert rc == 0
    # the driver built BOTH auxiliary legs itself
    for split in ("train", "val", "test"):
        assert os.path.exists(os.path.join(save, "nn", f"{split}.json"))
    for art in ("atom_templates.csv", "bond_templates.csv",
                "template_infos.csv", "preprocessed_train.csv"):
        assert os.path.exists(os.path.join(save, "templates", art))
    with open(os.path.join(save, "parity_results.json")) as f:
        results = json.load(f)
    assert results["recipe"] == "RetroSyn_tb"
    accs = results["accuracy"]
    assert isinstance(accs, list) and len(accs) == 2
    for acc in accs:
        assert set(int(k) for k in acc) == RETRO_KS
        assert all(0.0 <= v <= 1.0 for v in acc.values())


def test_check_artifacts_ready_and_missing(tmp_path, capsys):
    """scripts/check_artifacts.py (parity-day manifest validator): READY on
    complete fixtures, NOT READY with a named gap when a schema column or a
    file is missing; the goldens leg reports the RDKit dependency."""
    import check_artifacts
    import pandas as pd

    root = make_condition_data(str(tmp_path / "data"))
    argv = ["--recipe", "RCR", "--data_path", root,
            "--corpus_file", os.path.join(root, "corpus.csv"),
            "--nn_path", root, "--nn_prefix", ""]
    # fixture nn files are {split}_nn.json; the validator expects the
    # retrieve-CLI names -> link them
    for split, base in (("train", "train"), ("val", "val"), ("test", "test")):
        os.symlink(os.path.join(root, f"{split}_nn.json"),
                   os.path.join(root, f"{base}.json"))
    with pytest.raises(SystemExit) as e:
        check_artifacts.main(argv)
    out = capsys.readouterr().out
    assert e.value.code == 0, out
    assert "READY" in out and "parity_run.py --recipe RCR" in out

    # drop a required condition column -> NOT READY, column named
    df = pd.read_csv(os.path.join(root, "val.csv"))
    df.drop(columns=["solvent2"]).to_csv(os.path.join(root, "val.csv"),
                                         index=False)
    check_artifacts._REPORT.clear()
    with pytest.raises(SystemExit) as e:
        check_artifacts.main(argv)
    out = capsys.readouterr().out
    assert e.value.code == 1
    assert "MISSING" in out and "solvent2" in out

    # goldens leg: no RDKit in this image -> NOT READY with the reason
    check_artifacts._REPORT.clear()
    with pytest.raises(SystemExit) as e:
        check_artifacts.main(["--recipe", "goldens"])
    out = capsys.readouterr().out
    try:
        import rdkit  # noqa: F401
        assert e.value.code == 0
    except ImportError:
        assert e.value.code == 1 and "RDKit importable" in out
