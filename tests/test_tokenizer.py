"""BPE tokenizer: loads the public CLIP vocabulary (read from the reference
checkout at test time) and checks known token ids + roundtrips."""

import os.path as osp

import numpy as np
import pytest

VOCAB = "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"


@pytest.fixture(scope="module")
def tok():
    if not osp.exists(VOCAB):
        pytest.skip("CLIP BPE vocab not available")
    from imp_tpu.models.tokenizer import SimpleTokenizer

    return SimpleTokenizer(VOCAB)


def test_special_tokens(tok):
    # the canonical CLIP special ids
    assert tok.encoder["<|startoftext|>"] == 49406
    assert tok.encoder["<|endoftext|>"] == 49407


def test_roundtrip(tok):
    text = "a high-power h&e micrograph of tumor cells."
    ids = tok.encode(text)
    assert len(ids) > 0
    # BPE decode restores content with word-boundary spaces around punctuation
    back = tok.decode(ids).replace(" ", "")
    assert back == text.replace(" ", "")


def test_tokenize_array(tok):
    from imp_tpu.models.tokenizer import tokenize

    out = tokenize(["hello world", "histopathology slide"], tok, context_length=77)
    assert out.shape == (2, 77)
    assert (out[:, 0] == 49406).all()
    # EOT present and is the max id in each row
    for row in out:
        nz = row[row > 0]
        assert nz[-1] == 49407
        assert row.max() == 49407


def test_known_word_pieces(tok):
    # 'hello' is a single merged token in the CLIP vocab
    ids = tok.encode("hello")
    assert len(ids) == 1
    assert tok.decode(ids).strip() == "hello"
