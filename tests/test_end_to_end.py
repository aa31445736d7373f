"""End-to-end slice: train -> loss falls -> checkpoint -> beam-search test ->
metric dict, on the RCR task with a tiny model over the 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.trainer import Trainer

from fixtures import make_condition_data

TINY_ENC_JSON = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
    "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
}
TINY_DEC_JSON = dict(TINY_ENC_JSON, vocab_size=320, max_position_embeddings=32)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = make_condition_data(str(tmp_path_factory.mktemp("e2e")))
    with open(os.path.join(root, "enc.json"), "w") as f:
        json.dump(TINY_ENC_JSON, f)
    with open(os.path.join(root, "dec.json"), "w") as f:
        json.dump(TINY_DEC_JSON, f)
    return root


def _cfg(root, **kw):
    defaults = dict(
        task="condition", do_train=True, do_valid=False, do_test=True,
        data_path=root, train_file="train.csv", valid_file="val.csv",
        test_file="test.csv", corpus_file=os.path.join(root, "corpus.csv"),
        nn_path=root, train_nn_file="train_nn.json",
        valid_nn_file="val_nn.json", test_nn_file="test_nn.json",
        text_vocab_file=os.path.join(root, "text_vocab.txt"),
        encoder=os.path.join(root, "enc.json"),
        decoder=os.path.join(root, "dec.json"),
        encoder_tokenizer="text", num_neighbors=2, use_gold_neighbor=True,
        max_length=64, max_dec_length=16, batch_size=8, test_batch_size=8,
        epochs=2, lr=1e-3, num_beams=3, eval_per_epoch=1,
        save_path=os.path.join(root, "out"), compute_dtype="float32",
        dp_size=2, tp_size=1, log_every=1,
        length_buckets=(64,), dec_length_buckets=(16,),
        mlm=True, mlm_ratio=0.15, mlm_layer="mlp", mlm_lambda=0.1,
        shuffle_smiles=False, debug=True,
    )
    defaults.update(kw)
    return ExperimentConfig(**defaults)


@pytest.mark.slow
def test_condition_end_to_end(workdir):
    cfg = _cfg(workdir)
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()

    # loss fell over training
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert len(losses) >= 4
    assert losses[-1] < losses[0], losses

    # val metric logged for both corpora (full + gold-removed)
    val_recs = [r for r in records if "val_acc" in r]
    assert val_recs and "val_acc/1" in val_recs[-1]

    # checkpoints exist
    assert trainer.ckpt.exists("best") and trainer.ckpt.exists("last")

    # test produces predictions + accuracy dicts for both corpora
    results = trainer.test()
    assert len(results) == 2
    for acc in results:
        assert set(acc.keys()) == {1, 3, 5, 10, 15}
        for v in acc.values():
            assert 0.0 <= v <= 1.0
    pred_file = os.path.join(cfg.save_path, "prediction_test_0.json")
    with open(pred_file) as f:
        preds = json.load(f)
    assert len(preds) == 8
    first = next(iter(preds.values()))
    assert len(first["prediction"]) == 3  # num_beams
    assert all(isinstance(p, list) for p in first["prediction"])


@pytest.mark.slow
def test_resume_from_checkpoint(workdir):
    cfg = _cfg(workdir, epochs=3, do_test=False)
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()  # resumes from epoch 2 checkpoint written by previous test
    state = trainer._state
    assert int(state.step) > 0


@pytest.mark.slow
def test_gradient_accumulation(workdir):
    cfg = _cfg(workdir, epochs=1, do_test=False,
               save_path=os.path.join(workdir, "out_accum"),
               gradient_accumulation_steps=2, overwrite=True)
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    # 24 examples / batch 8 = 3 loader batches -> 1 full accum step + 1 flush
    assert int(trainer._state.step) == 2
    # compilations == distinct shape groups; the weight-0-padded trailing
    # flush must reuse a full window's compiled graph
    assert trainer._train_step_fn._cache_size() == trainer._accum_group_count


@pytest.mark.slow
def test_gradient_accumulation_multi_bucket(workdir):
    """Accumulation with several length buckets: microbatches land in
    different shape groups (the r1 jnp.stack crash scenario) and partial
    groups flush at epoch end."""
    cfg = _cfg(workdir, epochs=1, do_test=False,
               save_path=os.path.join(workdir, "out_accum_mb"),
               gradient_accumulation_steps=2, overwrite=True, batch_size=4,
               length_buckets=(16, 32, 48, 64), dec_length_buckets=(8, 16))
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    with open(os.path.join(cfg.save_path, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    # every loader batch was consumed: sum over shape groups of
    # (full windows + one flush for a partial group) == total steps
    assert int(trainer._state.step) >= 3  # 6 loader batches, accum 2
    # compilations == number of distinct shape groups, not flushes
    assert trainer._train_step_fn._cache_size() == trainer._accum_group_count


@pytest.mark.slow
def test_mlm_loss_decreases(workdir):
    """The auxiliary MLM objective itself must improve during training."""
    with open(os.path.join(workdir, "out", "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    mlm = [r["mlm_loss"] for r in records if "mlm_loss" in r]
    assert len(mlm) >= 4
    assert np.mean(mlm[-2:]) < np.mean(mlm[:2]), mlm


@pytest.mark.slow
def test_validate_only_mode(workdir):
    """--do_valid without --do_train: loads best.ckpt and reports both
    corpus variants (reference main.py:402-408)."""
    cfg = _cfg(workdir, do_train=False, do_valid=True, do_test=False)
    trainer = Trainer(cfg)
    trainer.prepare_data()
    scores = trainer.validate()
    assert set(scores.keys()) == {"val_acc", "val_acc/1"}
    for v in scores.values():
        assert 0.0 <= v <= 1.0
