"""Template-based retrosynthesis with ZERO fabricated artifacts: mapped
reactions -> native TemplateProcessor (extract + label CSVs) -> train the
atom/bond-head model on those labels -> ranked-edit prediction -> native
template decode -> retro metric. The complete reference chain
(get_templates.py -> main.py --template_based -> evaluate.py) on the own
chem kit end-to-end."""

import ast
import json
import os

import pandas as pd
import pytest

from textreact_tpu.chem import parse_smiles
from textreact_tpu.config import ExperimentConfig
from textreact_tpu.templates.native_extractor import demapped_canonical
from textreact_tpu.templates.processor import TemplateProcessor
from textreact_tpu.train.trainer import Trainer

TINY_ENC = {
    "vocab_size": 700, "hidden_size": 48, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 96,
    "max_position_embeddings": 96, "type_vocab_size": 1,
    "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
}

# four distinct reactions (distinct products -> learnable product->edit rule)
RXNS = [
    # esterification
    "[CH3:1][C:2](=[O:3])[OH:4].[CH3:5][OH:6]>>"
    "[CH3:1][C:2](=[O:3])[O:6][CH3:5]",
    # amide coupling
    "[CH3:1][C:2](=[O:3])[OH:4].[NH2:5][CH3:6]>>"
    "[CH3:1][C:2](=[O:3])[NH:5][CH3:6]",
    # amine alkylation
    "[Br:9][CH2:1][CH3:2].[NH2:3][CH3:4]>>[CH2:1]([CH3:2])[NH:3][CH3:4]",
    # dehydration (atom edit)
    "[CH3:1][CH:2]([OH:5])[CH3:3]>>[CH3:1][CH:2]=[CH2:3]",
]


@pytest.mark.slow
def test_template_based_cycle_on_extracted_artifacts(tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)

    # 1. mapped-reaction CSVs -> native processor artifacts
    for split, reps in (("train", 24), ("val", 1), ("test", 1)):
        pd.DataFrame({"id": range(len(RXNS) * reps),
                      "rxn_smiles": RXNS * reps}).to_csv(
            os.path.join(root, f"rxns_{split}.csv"), index=False)
    proc = TemplateProcessor(
        os.path.join(root, "rxns_train.csv"),
        os.path.join(root, "rxns_val.csv"),
        os.path.join(root, "rxns_test.csv"), root)
    assert proc.engine == "native"
    proc.run()

    # 2. task CSVs aligned with the preprocessed artifacts
    for split in ("train", "val", "test"):
        df = pd.read_csv(os.path.join(root, f"preprocessed_{split}.csv"))
        assert all(ast.literal_eval(v) for v in df["Labels"]), split
        pd.DataFrame({
            "id": [f"{split}{i}" for i in df.index],
            "product_smiles": df["ProductCanonSmiles"],
            "reactant_smiles": [
                demapped_canonical(parse_smiles(r)) for r in df["Reactants"]],
        }).to_csv(os.path.join(root, f"{split}.csv"), index=False)

    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC, f)

    # 3. train the template heads on the extracted labels
    cfg = ExperimentConfig(
        task="retro", template_based=True, unattend_nonbonds=True,
        do_train=True, do_test=True, data_path=root, template_path=root,
        train_file="train.csv", valid_file="val.csv", test_file="test.csv",
        encoder=os.path.join(root, "enc.json"),
        encoder_tokenizer="smiles", vocab_file=None,
        num_neighbors=-1, max_length=64, batch_size=16, test_batch_size=8,
        epochs=8, lr=2e-3, eval_per_epoch=1,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=1, log_every=1, length_buckets=(64,), debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()

    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses[-1] < losses[0]

    # 4. ranked-edit prediction -> native template decode -> retro metric
    from textreact_tpu.evaluation.retro import evaluate_retrosynthesis
    state = trainer._load_for_eval()
    loader = trainer._loaders(trainer.test_dataset, eval_mode=True)[0]
    with trainer.mesh:
        preds = trainer._predict(loader, state.params)
    data_df = pd.read_csv(os.path.join(root, "test.csv"))
    acc = evaluate_retrosynthesis(preds, data_df, top_k=10,
                                  template_based=True, template_path=root)
    assert set(acc) == {1, 2, 3, 5, 10, 20}
    # the 4-reaction rule is memorizable: gold reactants must be decoded
    # for most test examples within the top-3 edits
    assert acc[3] >= 0.5, acc
    assert acc[10] >= acc[3] >= acc[1] >= 0.0
