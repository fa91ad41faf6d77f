"""Self-contained SentencePiece reader/encoder (data/sentencepiece_lite.py).

The external wheel is absent, so the test hand-assembles a ModelProto in
protobuf wire format (the same bytes spm_train would write) and checks
parsing + unigram Viterbi segmentation + the reference tokenizer API
(sentencepiece_tokenizer.py:32-38).
"""

import struct

import pytest

from funcodec_tpu.data.sentencepiece_lite import (
    SPIECE_UNDERLINE as U,
    SentencePieceLite,
    SentencepiecesTokenizer,
    load_model,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, typ: int = 1) -> bytes:
    body = b""
    pb = piece.encode("utf-8")
    body += bytes([(1 << 3) | 2]) + _varint(len(pb)) + pb
    body += bytes([(2 << 3) | 5]) + struct.pack("<f", score)
    if typ != 1:
        body += bytes([(3 << 3) | 0]) + _varint(typ)
    return bytes([(1 << 3) | 2]) + _varint(len(body)) + body


@pytest.fixture()
def model_path(tmp_path):
    # vocab: control/unk + full chars + a couple of multi-char pieces whose
    # scores make the Viterbi prefer them over char-by-char
    pieces = [
        _piece("<unk>", 0.0, typ=2),
        _piece("<s>", 0.0, typ=3),
        _piece("</s>", 0.0, typ=3),
        _piece(U, -2.0),
        _piece(U + "hello", -1.0),
        _piece(U + "he", -4.0),
        _piece("llo", -4.0),
        _piece(U + "world", -1.5),
        _piece("h", -6.0), _piece("e", -6.0), _piece("l", -6.0),
        _piece("o", -6.0), _piece("w", -6.0), _piece("r", -6.0),
        _piece("d", -6.0),
    ]
    # interleave an unrelated ModelProto field (trainer_spec, field 2) to
    # check the skip logic
    trainer = bytes([(2 << 3) | 2]) + _varint(2) + b"\x08\x01"
    p = tmp_path / "toy.model"
    p.write_bytes(b"".join(pieces[:3]) + trainer + b"".join(pieces[3:]))
    return p


def test_load_model(model_path):
    pieces = load_model(model_path)
    assert pieces[0] == ("<unk>", 0.0, 2)
    assert (U + "hello", -1.0, 1) in pieces
    assert len(pieces) == 15


def test_viterbi_prefers_best_segmentation(model_path):
    sp = SentencePieceLite(model_path)
    assert sp.encode_as_pieces("hello world") == [U + "hello", U + "world"]
    # "hellod": no single piece; best split uses the big pieces
    assert sp.encode_as_pieces("hello") == [U + "hello"]
    out = sp.encode_as_pieces("held")
    assert "".join(out).replace(U, "") == "held"


def test_unknown_chars_map_to_unk(model_path):
    sp = SentencePieceLite(model_path)
    out = sp.encode_as_pieces("hz")
    assert "<unk>" in out


def test_reference_tokenizer_api(model_path):
    tok = SentencepiecesTokenizer(model_path)
    toks = tok.text2tokens("hello world")
    assert toks == [U + "hello", U + "world"]
    assert tok.tokens2text(toks) == "hello world"


def test_build_tokenizer_bpe(model_path):
    from funcodec_tpu.data.text import build_tokenizer

    tok = build_tokenizer("bpe", bpemodel=str(model_path))
    assert tok.text2tokens("hello") == [U + "hello"]
