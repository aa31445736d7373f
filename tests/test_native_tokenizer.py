"""C++ WordPiece twin (tokenizers/_ctok.cpp) vs the python tokenizer:
bit-identical ids on ASCII, python fallback for non-ASCII."""

import os
import random
import string
import tempfile

import pytest

from textreact_tpu.tokenizers import WordPieceTokenizer
from textreact_tpu.tokenizers.native import native_tokenizer_available

pytestmark = pytest.mark.skipif(not native_tokenizer_available(),
                                reason="no C++ toolchain")


def _vocab(tmpdir, extra=()):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "reaction", "was", "stir", "##red", "at", "room",
             "temperature", ",", ".", "with", "acid", "a", "##b", "##c",
             "ab", "b", "c", "x", "##x", "!", "?", "(", ")", "-",
             "1", "2", "##1", "0", "##0"] + list(extra)
    path = os.path.join(tmpdir, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(vocab) + "\n")
    return path


def _pair(d):
    nat = WordPieceTokenizer(_vocab(d), native=True)
    py = WordPieceTokenizer(_vocab(d), native=False)
    assert nat._native is not None
    assert py._native is None
    return nat, py


def test_native_matches_python_on_fixtures():
    with tempfile.TemporaryDirectory() as d:
        nat, py = _pair(d)
        for text in [
            "The reaction was STIRRED at room temperature.",
            "stirred, with acid",
            "xyzzy",
            "",
            "   ",
            "a-b-c (ab) x!? 10 21",
            "ab" * 60,                      # > max_chars_per_word -> [UNK]
            "a\tb\nc\rwith\x00acid\x7f.",   # controls cleaned/deleted
            "!!!...???",
        ]:
            assert nat(text)["input_ids"] == py(text)["input_ids"], text


def test_non_ascii_falls_back_to_python_path():
    with tempfile.TemporaryDirectory() as d:
        nat, py = _pair(d)
        for text in ["café acid", "中 with ab", "naïve x"]:
            assert nat._native.encode(text) is None
            assert nat(text)["input_ids"] == py(text)["input_ids"]


def test_native_fuzz_matches_python():
    with tempfile.TemporaryDirectory() as d:
        nat, py = _pair(d)
        rng = random.Random(0)
        alphabet = string.ascii_letters + string.digits + string.punctuation \
            + " \t\n\r" + "\x01\x02\x7f"
        for _ in range(400):
            n = rng.randrange(0, 60)
            text = "".join(rng.choice(alphabet) for _ in range(n))
            assert nat(text)["input_ids"] == py(text)["input_ids"], repr(text)


def test_native_fuzz_wordlike():
    """Zipfian word soup with known vocab fragments (exercises the greedy
    longest-match loop and ## continuations)."""
    with tempfile.TemporaryDirectory() as d:
        nat, py = _pair(d)
        rng = random.Random(1)
        frags = ["a", "b", "c", "ab", "x", "red", "stir", "1", "0", "q"]
        for _ in range(400):
            words = ["".join(rng.choice(frags)
                             for _ in range(rng.randrange(1, 5)))
                     for _ in range(rng.randrange(1, 10))]
            text = " ".join(words)
            assert nat(text)["input_ids"] == py(text)["input_ids"], text


def test_native_smiles_matches_python():
    from textreact_tpu.tokenizers import SmilesTokenizer
    nat = SmilesTokenizer(native=True)
    py = SmilesTokenizer(native=False)
    assert nat._native is not None
    cases = [
        "CCO", "c1ccccc1", "C(=O)[O-].[Na+]", "Br/C=C\\Cl",
        "CC(C)Cl.BrBr>>CC(C)Br", "[13CH3][C@@H](N)C(=O)O",
        "C%12CC%12", "C1CC1", "*$~@?:#=-+", "", "C[C", "%1C", "%",
        "[unclosed", "[]", "N>S>>O", "zZ!illegal C", "Cl9%99c",
    ]
    for s in cases:
        assert nat(s)["input_ids"] == py(s)["input_ids"], s
    enc_n = nat("CCO", text_pair="c1ccccc1")
    enc_p = py("CCO", text_pair="c1ccccc1")
    assert enc_n["input_ids"] == enc_p["input_ids"]


def test_native_smiles_fuzz():
    import random
    from textreact_tpu.tokenizers import SmilesTokenizer
    nat = SmilesTokenizer(native=True)
    py = SmilesTokenizer(native=False)
    rng = random.Random(2)
    alphabet = list("BCNOSPFIbcnosp()[].=#-+\\/:~@?>*$%0123456789rlHheKa ")
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        assert nat(s)["input_ids"] == py(s)["input_ids"], repr(s)
