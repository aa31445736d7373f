#!/bin/bash
# RCR time split (train/val/test partitioned by patent year).
# bf16 compute replaces fp16-mixed, and --text_vocab_file points at a local
# SciBERT WordPiece vocab.
SAVE_PATH=output/RCR_TS_textreact
NN_PATH=data/Tevatron_output/RCR_TS/
mkdir -p ${SAVE_PATH}

python -m textreact_tpu.cli.main \
    --task condition \
    --encoder allenai/scibert_scivocab_uncased \
    --decoder textreact_tpu/models/configs/bert_l6.json \
    --encoder_pretrained \
    --data_path data/RCR_TS/ \
    --train_file train.csv \
    --valid_file val.csv \
    --test_file test.csv \
    --vocab_file textreact_tpu/assets/condition_vocab.txt \
    --text_vocab_file data/scibert_scivocab_uncased/vocab.txt \
    --corpus_file data/USPTO_rxn_corpus.csv \
    --nn_path ${NN_PATH} \
    --train_nn_file train_rank.json \
    --valid_nn_file val_rank_full.json \
    --test_nn_file test_rank_full.json \
    --num_neighbors 3 \
    --use_gold_neighbor \
    --save_path ${SAVE_PATH} \
    --max_length 512 \
    --shuffle_smiles \
    --mlm --mlm_ratio 0.15 --mlm_layer mlp --mlm_lambda 0.1 \
    --lr 1e-4 \
    --batch_size 128 \
    --epochs 20 \
    --warmup 0.02 \
    --do_train --do_valid --do_test \
    --num_beams 15 \
    --compute_dtype bfloat16
# attention_impl defaults to 'flash' (fused Pallas kernels incl. in-kernel
# attention-prob dropout); pass --attention_impl xla for the reference path
