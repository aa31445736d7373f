"""Tokenizer tests: vocab parity, regex splitting, joint offsets, wordpiece."""

import os
import tempfile

import pytest

from textreact_tpu.tokenizers import (ConditionTokenizer, JointSmilesTextTokenizer,
                                      SmilesTokenizer, WordPieceTokenizer,
                                      atom_token_positions, tokenize_smiles)


def test_condition_vocab_specials():
    tok = ConditionTokenizer()
    # 315 tokens: 6 specials + '' (empty slot, id 6) + 308 molecule strings
    assert len(tok) == 315
    assert tok.vocab.get("") == 6
    assert tok.pad_token_id == 0
    assert tok.bos_token_id == 1
    assert tok.eos_token_id == 2
    assert tok.mask_token_id == 3
    assert tok.unk_token_id == 4


def test_condition_encode_decode():
    tok = ConditionTokenizer()
    conditions = ["", "C1CCCCC1", "", "BrBr", ""]
    enc = tok(conditions)
    assert enc["input_ids"][0] == tok.bos_token_id
    assert enc["input_ids"][-1] == tok.eos_token_id
    assert len(enc["input_ids"]) == 7
    assert enc["attention_mask"] == [1] * 7
    assert tok.decode(enc["input_ids"][1:-1]) == conditions
    # OOV molecule -> [UNK]
    enc2 = tok(["definitely_not_in_vocab"])
    assert enc2["input_ids"][1] == tok.unk_token_id


def test_smiles_regex_tokenize():
    assert tokenize_smiles("CC(=O)Oc1ccccc1") == [
        "C", "C", "(", "=", "O", ")", "O", "c", "1", "c", "c", "c", "c", "c", "1"]
    assert tokenize_smiles("Clc1ccccc1Br")[0] == "Cl"
    assert tokenize_smiles("[CH3:1]>>[CH4]") == ["[CH3:1]", ">>", "[CH4]"]
    assert tokenize_smiles("C%12CC%12") == ["C", "%12", "C", "C", "%12"]


def test_atom_token_positions():
    # parity with reference dataset.py:237-240 (atom tokens only)
    assert atom_token_positions("CC(=O)O") == [0, 1, 4, 6]
    assert atom_token_positions("c1ccccc1") == [0, 2, 3, 4, 5, 6]


def test_smiles_tokenizer_vocab():
    tok = SmilesTokenizer()
    assert len(tok) == 591  # file has no trailing newline: 591 tokens
    assert tok.pad_token_id == 0
    assert tok.unk_token_id == 11
    assert tok.cls_token_id == 12
    assert tok.sep_token_id == 13
    assert tok.mask_token_id == 14
    enc = tok("CCO")
    assert enc["input_ids"][0] == tok.cls_token_id
    assert enc["input_ids"][-1] == tok.sep_token_id
    assert tok.decode(enc["input_ids"]) == "CCO"


def _tiny_text_vocab(tmpdir):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "reaction", "was", "stir", "##red", "at", "room",
             "temperature", ",", ".", "with", "acid"]
    path = os.path.join(tmpdir, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(vocab) + "\n")
    return path


def test_wordpiece_tokenizer():
    with tempfile.TemporaryDirectory() as d:
        tok = WordPieceTokenizer(_tiny_text_vocab(d))
        assert tok.tokenize("The reaction was STIRRED at room temperature.") == [
            "the", "reaction", "was", "stir", "##red", "at", "room",
            "temperature", "."]
        assert tok.tokenize("xyzzy") == ["[UNK]"]
        enc = tok("stirred, with acid")
        assert enc["input_ids"][0] == tok.cls_token_id
        assert enc["input_ids"][-1] == tok.sep_token_id
        assert tok.decode(enc["input_ids"]) == "stirred , with acid"


def test_wordpiece_cache_matches_uncached():
    """The word-level memoization and the ASCII _clean fast path must be
    pure speedups: tokenization of arbitrary text (ascii + unicode,
    punctuation runs, control chars, CJK, accents) is identical with warm
    cache, cold cache, and the uncached reference algorithm."""
    import random

    from textreact_tpu.tokenizers.text import BasicTextTokenizer

    def reference_basic(text, lower=True):
        b = BasicTextTokenizer.__new__(BasicTextTokenizer)
        b.lower_case = lower
        text = b._clean(text)
        text = b._pad_cjk(text)
        tokens = []
        for word in text.split():
            if lower:
                word = b._strip_accents(word.lower())
            tokens.extend(b._split_punct(word))
        return tokens

    rng = random.Random(0)
    pool = ["the", "réaction", "STIRRED", "at", "25°C", "...", "a,b;c",
            "(aq)", "化合物", "naïve", "x\ty", "a\x00b", "\x0bz", "中文词",
            "H2O.", "[cat]", "", "-78", "±5%", "ΔG", "über"]
    basic = BasicTextTokenizer()
    for _ in range(300):
        text = " ".join(rng.choices(pool, k=rng.randrange(0, 12)))
        assert basic.tokenize(text) == reference_basic(text), repr(text)
        # warm-cache second pass identical
        assert basic.tokenize(text) == reference_basic(text), repr(text)


def test_joint_tokenizer_offsets():
    with tempfile.TemporaryDirectory() as d:
        text_tok = WordPieceTokenizer(_tiny_text_vocab(d))
        smi_tok = SmilesTokenizer()
        joint = JointSmilesTextTokenizer(text_tok, smi_tok)
        assert len(joint) == len(text_tok) + len(smi_tok)
        assert joint.smiles_offset == len(text_tok)
        enc = joint("CCO", text_pair="the reaction")
        # smiles segment ids are offset into the joint vocab
        n_smi = len(smi_tok("CCO")["input_ids"])
        assert all(i >= len(text_tok) for i in enc["input_ids"][:n_smi])
        # text segment drops its [CLS]
        text_ids = text_tok("the reaction")["input_ids"]
        assert enc["input_ids"][n_smi:] == text_ids[1:]
        assert len(enc["attention_mask"]) == len(enc["input_ids"])
        # list text_pair concatenates all segments
        enc2 = joint("CCO", text_pair=["the reaction", "was stirred"])
        assert len(enc2["input_ids"]) > len(enc["input_ids"])
        # pad id comes from the text vocab
        assert joint.pad_token_id == text_tok.pad_token_id


def test_joint_tokenizer_text_only_mode():
    with tempfile.TemporaryDirectory() as d:
        text_tok = WordPieceTokenizer(_tiny_text_vocab(d))
        joint = JointSmilesTextTokenizer(text_tok)
        assert joint.smiles_offset == 0
        assert len(joint) == len(text_tok)
        enc = joint("CCO", text_pair="the reaction")
        assert max(enc["input_ids"]) < len(text_tok)


def test_smiles_tokenizer_roundtrip_fuzz():
    """encode->decode must reproduce the input for vocabulary-covered SMILES."""
    import sys
    sys.path.insert(0, "tests")
    from test_chem_fuzz import DRUGS
    tok = SmilesTokenizer()
    for smi in DRUGS:
        if smi.startswith("[13C]") or ":" in smi:
            continue  # isotope/map tokens are not in the vocab
        enc = tok(smi)
        assert tok.decode(enc["input_ids"]) == smi, smi


def test_condition_tokenizer_real_vocab_roundtrip():
    tok = ConditionTokenizer()
    # every non-special vocab entry round-trips
    entries = [t for t in tok.vocab.token_to_id
               if not (t.startswith("[") and t.endswith("]"))][:50]
    enc = tok(entries)
    assert tok.decode(enc["input_ids"][1:-1]) == entries
