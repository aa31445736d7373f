"""Template-free retrosynthesis end-to-end: train -> beam test -> canonical
SMILES metric (top-{1,2,3,5,10,20})."""

import json
import os

import pytest

from textreact_tpu.config import ExperimentConfig
from textreact_tpu.train.trainer import Trainer

from fixtures import make_retro_data

TINY_ENC_JSON = {
    "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
    "num_attention_heads": 4, "intermediate_size": 64,
    "max_position_embeddings": 128, "type_vocab_size": 1,
}
TINY_DEC_JSON = dict(TINY_ENC_JSON, vocab_size=600, max_position_embeddings=48)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = make_retro_data(str(tmp_path_factory.mktemp("retro")))
    for name, cfg in [("enc.json", TINY_ENC_JSON), ("dec.json", TINY_DEC_JSON)]:
        with open(os.path.join(root, name), "w") as f:
            json.dump(cfg, f)
    return root


@pytest.mark.slow
def test_retro_tf_end_to_end(workdir):
    root = workdir
    cfg = ExperimentConfig(
        task="retro", do_train=True, do_test=True,
        data_path=root, train_file="train.csv", valid_file="valid.csv",
        test_file="test.csv", corpus_file=os.path.join(root, "corpus.csv"),
        nn_path=root, train_nn_file="train_nn.json",
        valid_nn_file="valid_nn.json", test_nn_file="test_nn.json",
        text_vocab_file=os.path.join(root, "text_vocab.txt"),
        encoder=os.path.join(root, "enc.json"),
        decoder=os.path.join(root, "dec.json"),
        encoder_tokenizer="text", vocab_file=None,
        num_neighbors=2, use_gold_neighbor=True, random_neighbor_ratio=0.2,
        max_length=64, max_dec_length=32, batch_size=8, test_batch_size=8,
        epochs=1, lr=1e-3, num_beams=2, save_path=os.path.join(root, "out"),
        compute_dtype="float32", dp_size=1, log_every=1,
        length_buckets=(64,), dec_length_buckets=(32,), debug=True,
    ).validate()
    trainer = Trainer(cfg)
    trainer.prepare_data()
    trainer.fit()
    results = trainer.test()
    assert len(results) == 2  # dual corpus
    for acc in results:
        assert set(acc.keys()) == {1, 2, 3, 5, 10, 20}
    with open(os.path.join(cfg.save_path, "prediction_test_0.json")) as f:
        preds = json.load(f)
    first = next(iter(preds.values()))
    # retro predictions decode to SMILES strings
    assert all(isinstance(p, str) for p in first["prediction"])
