"""Training/eval/test orchestration.

Role of reference main.py:100-412 (LightningModule + DataModule + Trainer):
epoch loop with per-step jitted updates, dual-corpus evaluation every
eval_per_epoch epochs, best/last checkpointing on the val metric, resume,
beam-search testing with prediction JSON + accuracy dicts.
"""

from __future__ import annotations

import json
import math
import os
import random as _random
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data import (DATASET_CLS, Batch, Collator, DataLoader,
                    generate_train_label_corpus, read_corpus)
from ..evaluation import (evaluate_reaction_condition, evaluate_retrosynthesis,
                          edits_from_topk, gather_prediction_each_neighbor)
from ..inference.predictor import Generator, predictions_from_beams
from ..models import build_model
from ..parallel.mesh import batch_sharding, make_mesh
from ..parallel.sharding import shard_params
from ..tokenizers import get_tokenizers
from ..utils.logging import MetricLogger, log, setup_logging
from ..utils.profiling import StepTimer
from .checkpoint import CheckpointManager
from .optim import make_optimizer
from .step import TrainState, make_eval_step, make_train_step


class Trainer:
    def __init__(self, cfg: ExperimentConfig):
        setup_logging()
        cfg.validate()
        self.cfg = cfg
        _random.seed(cfg.seed)
        np.random.seed(cfg.seed)

        self.enc_tokenizer, self.dec_tokenizer = get_tokenizers(cfg)
        self.module, self.enc_config, self.dec_config = build_model(
            cfg, self.enc_tokenizer, self.dec_tokenizer)
        self.mesh = make_mesh(cfg.dp_size, cfg.tp_size)
        self.batch_sharding = batch_sharding(self.mesh)
        self.ckpt = CheckpointManager(cfg.save_path, cfg.val_metric)
        self.metrics = MetricLogger(cfg.save_path, use_wandb=not cfg.debug)
        if cfg.template_based:
            self.dec_pad_id = 0
        else:
            self.dec_pad_id = self.dec_tokenizer.pad_token_id

        # multi-process runs need host-content-independent batch shapes:
        # each host collates its own shard but the SPMD step is one global
        # program, so length buckets / batch-max atom counts would diverge
        # across hosts and hang or mis-assemble the global array
        self.collator = Collator(cfg, self.enc_tokenizer.pad_token_id,
                                 self.dec_pad_id,
                                 static_shapes=jax.process_count() > 1)
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None
        self._state: Optional[TrainState] = None
        self._tx = None

    # ------------------------------------------------------------------
    # data (reference main.py:279-346)
    # ------------------------------------------------------------------
    def prepare_data(self) -> None:
        cfg = self.cfg
        dataset_cls = DATASET_CLS[cfg.task]

        def build(file, split):
            ds = dataset_cls(cfg, os.path.join(cfg.data_path, file),
                             self.enc_tokenizer, self.dec_tokenizer, split=split)
            log.info("%s dataset: %d", split, len(ds))
            return ds

        if cfg.do_train:
            self.train_dataset = build(cfg.train_file, "train")
        if cfg.do_train or cfg.do_valid:
            self.val_dataset = build(cfg.valid_file, "val")
        if cfg.do_test:
            self.test_dataset = build(cfg.test_file, "test")
        if cfg.corpus_file:
            if cfg.train_label_corpus:
                corpus = generate_train_label_corpus(
                    os.path.join(cfg.data_path, cfg.train_file))
            else:
                corpus = read_corpus(cfg.corpus_file, cfg.cache_path)
            nn = lambda f: os.path.join(cfg.nn_path, f)
            if self.train_dataset is not None:
                self.train_dataset.load_corpus(corpus, nn(cfg.train_nn_file))
                self._print_example(self.train_dataset)
            if self.val_dataset is not None:
                self.val_dataset.load_corpus(corpus, nn(cfg.valid_nn_file))
            if self.test_dataset is not None:
                self.test_dataset.load_corpus(corpus, nn(cfg.test_nn_file))

    def _print_example(self, dataset) -> None:
        """Decode + log the first train example (reference dataset.py:154-168)."""
        ex = dataset.example(0, rng=_random.Random(0), augment=False)
        log.info("example encoder input: %s",
                 self.enc_tokenizer.decode(ex["input_ids"]))
        if not self.cfg.template_based and "decoder_input_ids" in ex:
            log.info("example decoder input: %s",
                     self.dec_tokenizer.decode(ex["decoder_input_ids"]))

    def _loaders(self, dataset, eval_mode: bool) -> List[DataLoader]:
        cfg = self.cfg
        bs = cfg.test_batch_size if dataset is self.test_dataset else cfg.batch_size
        # background-thread prefetch overlaps host batch assembly with device
        # steps; the loader's fork-pool mode (num_workers>1) is for offline
        # use — forking after the TPU runtime initializes is unsafe
        kw = dict(collator=self.collator, batch_size=bs, seed=cfg.seed)
        if jax.process_count() > 1:
            # per-process loader shard; each host feeds its local batch slice
            bs = bs // jax.process_count()
            kw["batch_size"] = bs
        if not eval_mode:
            loader = DataLoader(dataset, shuffle=True, **kw)
            if jax.process_count() > 1:
                loader.shard_across_processes(jax.process_index(),
                                              jax.process_count())
            return [loader]
        loaders = [DataLoader(dataset, shuffle=False, augment=False, **kw)]
        if cfg.corpus_file:
            # dual-corpus eval: full + gold-removed (main.py:330-340)
            loaders.append(DataLoader(dataset.with_skip_gold(), shuffle=False,
                                      augment=False, **kw))
        return loaders

    # ------------------------------------------------------------------
    # model state
    # ------------------------------------------------------------------
    def _init_params(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        L = min(cfg.max_length, 64)
        dummy = {
            "input_ids": jnp.zeros((2, L), jnp.int32),
            "attention_mask": jnp.ones((2, L), jnp.int32),
        }
        if cfg.template_based:
            dummy["atom_indices"] = jnp.zeros((2, 8), jnp.int32)
            dummy["bond_pairs"] = jnp.zeros((2, 8, 2), jnp.int32)
        else:
            dummy["decoder_input_ids"] = jnp.zeros((2, 8), jnp.int32)
            dummy["decoder_attention_mask"] = jnp.ones((2, 8), jnp.int32)
        if cfg.mlm:
            dummy["mlm_prefix_len"] = 16 if L >= 16 else L
        params = self.module.init(rng, **dummy)
        if cfg.encoder_pretrained and self.cfg.encoder and os.path.isdir(self.cfg.encoder):
            from ..models.import_hf import load_pretrained_encoder
            params = load_pretrained_encoder(params, self.cfg.encoder,
                                             self.enc_config)
        if cfg.decoder_pretrained:
            # reference model.py:22-24: decoder half loaded from a BERT
            # checkpoint (cross-attention freshly initialized)
            if cfg.template_based:
                raise ValueError("--decoder_pretrained requires a seq2seq "
                                 "decoder (not --template_based)")
            if not (self.cfg.decoder and os.path.isdir(self.cfg.decoder)):
                raise ValueError(
                    "--decoder_pretrained needs --decoder to point at a local "
                    f"HF checkpoint directory, got {self.cfg.decoder!r}")
            from ..models.import_hf import load_pretrained_decoder
            params = load_pretrained_decoder(params, self.cfg.decoder,
                                             self.dec_config)
        return shard_params(self.mesh, params)

    def _num_training_steps(self) -> int:
        cfg = self.cfg
        steps_per_epoch = math.ceil(
            len(self.train_dataset)
            / (cfg.batch_size * cfg.gradient_accumulation_steps))
        return steps_per_epoch * cfg.epochs

    def _device_batch(self, batch: Batch) -> Dict[str, jax.Array]:
        from ..parallel.multihost import device_put_global
        return device_put_global(batch.arrays, self.batch_sharding)

    # ------------------------------------------------------------------
    # fit (reference main.py:386-397)
    # ------------------------------------------------------------------
    def fit(self) -> None:
        cfg = self.cfg
        num_steps = self._num_training_steps()
        log.info("num training steps: %d", num_steps)
        self._tx = make_optimizer(cfg, num_steps)
        accum = max(1, cfg.gradient_accumulation_steps)

        start_epoch, best_score = 0, None
        if cfg.overwrite:
            self.ckpt.clear()
        from ..parallel.sharding import ensure_mesh_placement, zero1_opt_state
        params = self._init_params()
        state = ensure_mesh_placement(self.mesh, TrainState.create(params, self._tx))
        if cfg.zero1:
            state = state.replace(
                opt_state=zero1_opt_state(self.mesh, state.opt_state))
        if self.ckpt.exists(cfg.load_ckpt):
            state, meta = self.ckpt.restore(cfg.load_ckpt, state)
            state = ensure_mesh_placement(self.mesh, state)
            if cfg.zero1:
                state = state.replace(
                    opt_state=zero1_opt_state(self.mesh, state.opt_state))
            start_epoch = int(meta.get("epoch", -1)) + 1
            best_score = meta.get(cfg.val_metric)
            log.info("resumed from %s at epoch %d", cfg.load_ckpt, start_epoch)
            # durable resume record (crash-recovery evidence; the console
            # line can be swallowed by absl's root handler)
            self.metrics.log({"resumed_from": cfg.load_ckpt,
                              "resumed_at_epoch": start_epoch},
                             int(state.step))

        # pin the step's output-state shardings to the canonical layout so
        # step 2 never recompiles and ZeRO-1 placement survives the update
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        if accum > 1:
            from .step import make_accum_train_step
            train_step = make_accum_train_step(self.module, cfg, self._tx,
                                               self.dec_pad_id,
                                               state_shardings=state_shardings)
        else:
            train_step = make_train_step(self.module, cfg, self._tx,
                                         self.dec_pad_id,
                                         state_shardings=state_shardings)
        self._train_step_fn = train_step  # introspectable (compile-count tests)
        eval_step = make_eval_step(self.module, cfg, self.dec_pad_id,
                                   edit_topk=1)

        rng = jax.random.key(cfg.seed, impl=cfg.dropout_rng_impl)
        loader = self._loaders(self.train_dataset, eval_mode=False)[0]
        timer = StepTimer()
        global_step = int(state.step)
        from ..utils.profiling import trace
        profile_dir = os.path.join(cfg.save_path, "profile") if cfg.profile else None
        # Accumulation microbatches are buffered PER SHAPE BUCKET: the
        # collator pads to length buckets, so consecutive loader batches can
        # have different shapes and cannot be stacked together. Each bucket
        # accumulates independently and flushes when it holds `accum`
        # microbatches; at epoch end, partial buffers are padded with
        # weight-0 copies so the scanned step sees one leading extent per
        # shape (no flush recompile).
        micro_buffers: Dict[Any, List[Dict[str, jax.Array]]] = {}

        def shape_key(b: Dict[str, jax.Array]):
            return tuple(sorted((k, v.shape) for k, v in b.items()))

        def stacked(buffer, n_real):
            buffer = buffer + [buffer[0]] * (accum - len(buffer))
            mbs = {k: jnp.stack([b[k] for b in buffer]) for k in buffer[0]}
            weights = jnp.asarray(
                [1.0] * n_real + [0.0] * (accum - n_real), jnp.float32)
            return mbs, weights

        with self.mesh, trace(profile_dir):
            for epoch in range(start_epoch, cfg.epochs):
                loader.set_epoch(epoch)
                for batch in loader:
                    if accum > 1:
                        # accumulate N loader batches per optimizer step
                        # (reference accumulate_grad_batches, main.py:381)
                        db = self._device_batch(batch)
                        buf = micro_buffers.setdefault(shape_key(db), [])
                        buf.append(db)
                        if len(buf) < accum:
                            continue
                        mbs, weights = stacked(buf, accum)
                        buf.clear()
                        state, metrics = train_step(state, mbs, weights, rng)
                    else:
                        state, metrics = train_step(state, self._device_batch(batch), rng)
                    timer.tick()
                    global_step += 1
                    if global_step % cfg.log_every == 0:
                        host = {k: float(v) for k, v in metrics.items()}
                        host["steps_per_sec"] = timer.steps_per_sec
                        host["epoch"] = epoch
                        self.metrics.log(host, global_step)
                for buf in micro_buffers.values():
                    if not buf:
                        continue
                    # flush a trailing partial window, padded to the full
                    # accumulation extent with weight-0 microbatches
                    mbs, weights = stacked(buf, len(buf))
                    buf.clear()
                    state, metrics = train_step(state, mbs, weights, rng)
                    global_step += 1
                self._accum_group_count = len(micro_buffers)
                if (epoch + 1) % cfg.eval_per_epoch == 0 and self.val_dataset is not None:
                    scores = self._run_validation(eval_step, state.params)
                    self.metrics.log(scores, global_step)
                    log.info("epoch %d: %s", epoch, scores)
                    best_score = self.ckpt.save_eval(
                        state, scores[cfg.val_metric], best_score, epoch)
                else:
                    self.ckpt.save("last", state, {"epoch": epoch})
        self.ckpt.finalize()  # publish the overlapped final save
        self._state = state

    # ------------------------------------------------------------------
    # validation (reference main.py:177-196)
    # ------------------------------------------------------------------
    def _run_validation(self, eval_step, params) -> Dict[str, float]:
        cfg = self.cfg
        out: Dict[str, float] = {}
        with self.mesh:
            for li, loader in enumerate(self._loaders(self.val_dataset, True)):
                per_example: Dict[int, float] = {}
                for batch in loader:
                    res = eval_step(params, self._device_batch(batch))
                    key = "acc" if cfg.val_metric == "val_acc" and "acc" in res else "loss"
                    if cfg.template_based and cfg.val_metric == "val_acc":
                        scores = self._template_top1(res, batch)
                    else:
                        scores = np.asarray(res[key])
                    mask = np.asarray(res["example_mask"]).astype(bool)
                    idxs = np.asarray(res["indices"])
                    for i, s in zip(idxs[mask], scores[mask]):
                        per_example[int(i)] = float(s)
                # multi-process: union the id-keyed scores over DCN
                # (replaces reference dist.all_gather_object, main.py:259-268)
                from ..parallel.multihost import gather_score_dict
                per_example = gather_score_dict(per_example)
                name = cfg.val_metric if li == 0 else f"{cfg.val_metric}/{li}"
                out[name] = float(np.mean(list(per_example.values())))
        return out

    def _template_top1(self, res, batch: Batch) -> np.ndarray:
        """Greedy template accuracy (reference main.py:139-149): top-ranked
        edit in the gold raw label set, scaled by 1/len(labels). The edit
        ranking itself runs on device (device_topk_edits in the eval step);
        only the two per-example top-1 candidates reach the host."""
        av, ai, bv, bi = (np.asarray(res["atom_topk_vals"]),
                          np.asarray(res["atom_topk_idx"]),
                          np.asarray(res["bond_topk_vals"]),
                          np.asarray(res["bond_topk_idx"]))
        n_a1 = self.module.num_atom_templates + 1
        n_b1 = self.module.num_bond_templates + 1
        B = av.shape[0]
        out = np.zeros((B,), dtype=np.float32)
        for b, (bonds, raw) in enumerate(zip(batch.host["bonds"],
                                             batch.host["raw_template_labels"])):
            edits, _ = edits_from_topk(av[b], ai[b], bv[b], bi[b],
                                       n_a1, n_b1, bonds, top_num=1)
            hit = bool(edits) and edits[0] in [tuple(r) for r in raw]
            out[b] = float(hit) / max(len(raw), 1)
        return out

    def validate(self) -> Dict[str, float]:
        eval_step = make_eval_step(self.module, self.cfg, self.dec_pad_id)
        state = self._load_for_eval()
        scores = self._run_validation(eval_step, state.params)
        log.info("validation: %s", scores)
        return scores

    # ------------------------------------------------------------------
    # test (reference main.py:198-257)
    # ------------------------------------------------------------------
    def test(self) -> List[Dict]:
        cfg = self.cfg
        state = self._load_for_eval()
        results = []
        from ..parallel.multihost import gather_prediction_dict, is_primary
        with self.mesh:
            for li, loader in enumerate(self._loaders(self.test_dataset, True)):
                predictions = self._predict(loader, state.params)
                # union the id-keyed predictions across hosts BEFORE
                # aggregation/writing/metrics (reference main.py:236-268) —
                # a per-host shard would otherwise be scored against the
                # full len(data_df) denominator
                predictions = gather_prediction_dict(predictions)
                if cfg.test_each_neighbor:
                    predictions = gather_prediction_each_neighbor(
                        predictions, cfg.test_num_neighbors)
                path = os.path.join(
                    cfg.save_path, f"prediction_{self.test_dataset.name}_{li}.json")
                if is_primary():  # single writer
                    with open(path, "w") as f:
                        json.dump(predictions, f)
                if cfg.task == "condition":
                    accuracy = evaluate_reaction_condition(
                        predictions, self.test_dataset.data_df)
                else:
                    accuracy = evaluate_retrosynthesis(
                        predictions, self.test_dataset.data_df, cfg.num_beams,
                        template_based=cfg.template_based,
                        template_path=cfg.template_path,
                        num_workers=min(16, os.cpu_count() or 1))
                log.info("test accuracy (%d): %s", li, accuracy)
                print(json.dumps({str(k): v for k, v in accuracy.items()}))
                results.append(accuracy)
        return results

    def _predict(self, loader, params) -> Dict[int, Dict[str, Any]]:
        cfg = self.cfg
        predictions: Dict[int, Dict[str, Any]] = {}
        if cfg.template_based:
            # top-500 edit ranking on device (reference combined_edit top 500,
            # main.py:211-216) — the host receives 2x500 candidates/example
            # instead of the full probability grids
            eval_step = make_eval_step(self.module, cfg, self.dec_pad_id,
                                       edit_topk=500)
            n_a1 = self.module.num_atom_templates + 1
            n_b1 = self.module.num_bond_templates + 1
            for batch in loader:
                res = eval_step(params, self._device_batch(batch))
                av, ai = np.asarray(res["atom_topk_vals"]), np.asarray(res["atom_topk_idx"])
                bv, bi = np.asarray(res["bond_topk_vals"]), np.asarray(res["bond_topk_idx"])
                mask = np.asarray(res["example_mask"]).astype(bool)
                idxs = np.asarray(res["indices"])
                for b in np.nonzero(mask)[0]:
                    bonds = batch.host["bonds"][b]
                    raw = [tuple(r) for r in batch.host["raw_template_labels"][b]]
                    edits, probs = edits_from_topk(av[b], ai[b], bv[b], bi[b],
                                                   n_a1, n_b1, bonds,
                                                   top_num=500)
                    predictions[int(idxs[b])] = {
                        "prediction": edits,
                        "score": probs,
                        "raw_template_labels": raw,
                        "top1_template_match": bool(edits) and edits[0] in raw,
                    }
        else:
            generator = Generator(self.module, params, cfg.num_beams,
                                  cfg.max_dec_length)
            for batch in loader:
                seqs, scores = generator.generate(batch.arrays)
                predictions.update(predictions_from_beams(
                    seqs, scores, batch.arrays["indices"],
                    batch.arrays["example_mask"], self.dec_tokenizer))
        return predictions

    def _load_for_eval(self) -> TrainState:
        cfg = self.cfg
        if self._state is not None:
            return self._state
        from ..parallel.sharding import ensure_mesh_placement
        tx = self._tx or make_optimizer(cfg, max(1, self._safe_num_steps()))
        state = ensure_mesh_placement(
            self.mesh, TrainState.create(self._init_params(), tx))
        name = cfg.load_ckpt if self.ckpt.exists(cfg.load_ckpt) else "best"
        if self.ckpt.exists(name):
            state, _ = self.ckpt.restore(name, state)
            state = ensure_mesh_placement(self.mesh, state)
            log.info("loaded checkpoint: %s", name)
        else:
            log.warning("no checkpoint found in %s; evaluating random init",
                        cfg.save_path)
        self._state = state
        return state

    def _safe_num_steps(self) -> int:
        if self.train_dataset is not None:
            return self._num_training_steps()
        return 1000


def run(cfg: ExperimentConfig):
    """Full experiment driver (reference main.py:349-412). Returns the test
    accuracy dicts (one per eval corpus) when --do_test ran, else None —
    recorded by scripts/parity_run.py."""
    trainer = Trainer(cfg)
    trainer.prepare_data()
    if cfg.do_train:
        trainer.fit()
    if cfg.do_valid:
        trainer.validate()
    if cfg.do_test:
        return trainer.test()
    return None
