"""Self-contained G2P fallback (data/g2p_fallback.py) — the dependency-free
stand-in for g2p_en (reference phoneme_tokenizer.py:209)."""

import numpy as np

from funcodec_tpu.data.g2p_fallback import ARPA_VOWELS, G2pFallback, expand_numbers
from funcodec_tpu.data.text import PhonemeTokenizer, build_tokenizer


def test_lexicon_words_exact():
    g = G2pFallback()
    assert g("the") == ["DH", "AH0"]
    assert g("hello world") == ["HH", "AH0", "L", "OW1", " ", "W", "ER1", "L", "D"]
    assert g("water") == ["W", "AO1", "T", "ER0"]


def test_rule_words_are_plausible_arpabet():
    g = G2pFallback()
    valid = {v + d for v in ARPA_VOWELS for d in "012"} | {
        "B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M", "N",
        "NG", "P", "R", "S", "SH", "T", "TH", "V", "W", "Y", "Z", "ZH",
    }
    for word in ("blorping", "cromulent", "phonetics", "cake", "station",
                 "knight", "checker", "quiz"):
        phones = [p for p in g(word) if p != " "]
        assert phones, word
        assert all(p in valid for p in phones), (word, phones)
        # every pronounceable word has at least one stressed vowel
        assert any(p[-1] == "1" for p in phones if p[:-1] in ARPA_VOWELS), (
            word, phones,
        )


def test_specific_rules():
    g = G2pFallback()
    assert [p for p in g("cake") if p != " "] == ["K", "EY1", "K"]  # magic e
    assert [p for p in g("station") if p != " "] == ["S", "T", "EY1", "SH", "AH0", "N"]
    assert [p for p in g("knight") if p != " "] == ["N", "AY1", "T"]
    assert [p for p in g("phone") if p != " "] == ["F", "OW1", "N"]


def test_numbers_and_punctuation():
    g = G2pFallback()
    assert expand_numbers("21 dogs") == " twenty one  dogs"
    toks = g("I have 3 cats, really!")
    assert "," in toks and "!" in toks
    # "3" -> "three" -> lexicon
    flat = [p for p in toks if p != " "]
    assert "TH" in flat and "R" in flat


def test_phoneme_tokenizer_falls_back_without_g2p_en():
    # g2p_en is absent from this image: construction must NOT raise
    tok = PhonemeTokenizer("g2p_en")
    out = tok.text2tokens("hello world")
    assert " " not in out and len(out) >= 8

    tok2 = build_tokenizer("phn", g2p_type="g2p_fallback")
    assert tok2.text2tokens("the") == ["DH", "AH0"]
