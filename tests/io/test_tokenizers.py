"""Tokenizer parity vs the HuggingFace implementations.

CLIP BPE is checked against ``transformers.CLIPTokenizer`` built from the
same (tiny, hand-written) vocab/merges files; the SentencePiece unigram
tokenizer is checked against the ``tokenizers`` Rust Unigram model over the
same piece/score table.  This validates the algorithms; production use loads
the real vocab files from HF checkpoint dirs with the same loaders.
"""

import json

import numpy as np
import pytest

from compactfusion_tpu.io.tokenizers import (
    ClipBPETokenizer,
    UnigramTokenizer,
    load_clip_tokenizer,
)

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")


# ---------------------------------------------------------------------------
# CLIP BPE
# ---------------------------------------------------------------------------

# the transformers CLIP tokenizer test fixture vocabulary
CLIP_VOCAB = [
    "l", "o", "w", "e", "r", "s", "t", "i", "d", "n",
    "lo", "l</w>", "w</w>", "r</w>", "t</w>", "low</w>", "er</w>",
    "lowest</w>", "newer</w>", "wider", "<unk>",
    "<|startoftext|>", "<|endoftext|>",
]
CLIP_MERGES = ["#version: 0.2", "l o", "lo w</w>", "e r</w>"]


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_tok")
    vocab = {tok: i for i, tok in enumerate(CLIP_VOCAB)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("\n".join(CLIP_MERGES))
    return d


@pytest.mark.parametrize(
    "text",
    [
        "lower newer",
        "lo l lower newest",
        "LOWER   NeWeR",  # case + whitespace cleanup
        "wider er low",
        "unknownword lower",  # oov bytes -> unk
    ],
)
def test_clip_bpe_matches_transformers(clip_files, text):
    hf = transformers.CLIPTokenizer(
        str(clip_files / "vocab.json"), str(clip_files / "merges.txt")
    )
    ours = load_clip_tokenizer(str(clip_files))
    assert ours.tokenize(text) == hf.tokenize(text)
    ref = hf(text, padding="max_length", max_length=16, truncation=True)
    got = ours([text], max_length=16)[0]
    assert got.tolist() == ref["input_ids"], (got.tolist(), ref["input_ids"])


def test_clip_batch_shape_and_decode(clip_files):
    tok = load_clip_tokenizer(str(clip_files))
    ids = tok(["lower newer", "low"], max_length=8)
    assert ids.shape == (2, 8) and ids.dtype == np.int32
    assert tok.decode(ids[1].tolist()) == "low"


# ---------------------------------------------------------------------------
# SentencePiece unigram
# ---------------------------------------------------------------------------

UNI_VOCAB = [
    ("<unk>", 0.0),
    ("▁", -2.0),
    ("▁the", -1.0),
    ("▁a", -1.5),
    ("▁photo", -2.5),
    ("▁of", -1.2),
    ("▁cat", -2.1),
    ("▁dog", -2.2),
    ("▁photograph", -4.0),
    ("photo", -3.0),
    ("graph", -2.8),
    ("c", -5.0),
    ("a", -4.9),
    ("t", -4.8),
    ("th", -4.5),
    ("e", -4.7),
    ("▁t", -4.6),
    ("he", -4.4),
    ("o", -5.1),
    ("f", -5.2),
    ("d", -5.3),
    ("g", -5.4),
    ("p", -5.5),
    ("h", -5.6),
    ("r", -5.7),
]


@pytest.fixture(scope="module")
def hf_unigram():
    from tokenizers import Tokenizer, models, pre_tokenizers

    t = Tokenizer(models.Unigram(UNI_VOCAB, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    return t


@pytest.fixture(scope="module")
def ours_unigram():
    return UnigramTokenizer(
        [(p, s) for p, s in UNI_VOCAB],
        unk_id=0,
        eos_id=0,  # no eos piece in this tiny vocab; not used in parity
        pad_id=0,
        control_ids=set(),
    )


@pytest.mark.parametrize(
    "text",
    [
        "the cat",
        "a photo of the dog",
        "photograph of a cat",
        "the the the",
        "cat dog cat",
        "tthheo",  # forces competitive Viterbi paths
    ],
)
def test_unigram_matches_tokenizers_lib(hf_unigram, ours_unigram, text):
    ref = hf_unigram.encode(text).ids
    got = ours_unigram.tokenize_ids(text)
    assert got == ref, (got, ref, hf_unigram.encode(text).tokens)


def test_unigram_unknown_chars_fuse(ours_unigram):
    # "xyz" has no pieces: consecutive unknowns fuse to ONE unk (spm rule)
    ids = ours_unigram.tokenize_ids("xyz")
    # leading "▁" piece exists, then a single fused unk
    assert ids.count(0) == 1


def test_unigram_model_proto_roundtrip(tmp_path):
    """Serialize a ModelProto by hand and parse it back."""
    import struct

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wire, payload):
        return varint((num << 3) | wire) + payload

    def piece(text, score, ptype=1):
        body = field(1, 2, varint(len(text.encode())) + text.encode())
        body += field(2, 5, struct.pack("<f", score))
        body += field(3, 0, varint(ptype))
        return field(1, 2, varint(len(body)) + body)

    blob = (
        piece("<pad>", 0.0, 3)
        + piece("</s>", 0.0, 3)
        + piece("<unk>", 0.0, 2)
        + piece("▁hello", -2.0)
        + piece("▁world", -2.5)
        + piece("▁", -3.0)
    )
    p = tmp_path / "spiece.model"
    p.write_bytes(blob)
    tok = UnigramTokenizer.from_model_file(str(p))
    assert tok.unk_id == 2
    ids, mask = tok(["hello world"], max_length=8)
    assert ids.shape == (1, 8)
    assert ids[0, :3].tolist() == [3, 4, 1]  # ▁hello ▁world </s>
    assert mask[0, :3].all() and not mask[0, 3:].any()
    assert tok.decode(ids[0].tolist()) == "hello world"
