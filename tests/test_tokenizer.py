"""Tokenizer behavior tests against the reference contract (bark.cpp:480-662)."""

import numpy as np

from bark_tpu.params import bark_context_default_params
from bark_tpu.text import Vocab, bert_tokenize, strip_accents, tokenize_input


def make_vocab():
    # mini WordPiece vocab; ids are positions
    toks = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]",       # 0-3
        "hello", "world", "hell", "##o",          # 4-7
        "he", "##llo", "##ll", "##l",             # 8-11
        ",", ".", "!", "?",                       # 12-15
        "a", "b", "c", "1", "2", "##2", "12",     # 16-22
        "un", "##break", "##able",                # 23-25
    ]
    return Vocab.from_tokens(toks)


def test_strip_accents():
    assert strip_accents("héllo wörld") == "hello world"
    assert strip_accents("ÀÉÎÕÜç ñ") == "AEIOUc n"
    # unmapped codepoints pass through
    assert strip_accents("日本 ß") == "日本 ß"


def test_longest_match_first():
    v = make_vocab()
    # "hello" exists whole -> single token, not hell+##o
    assert bert_tokenize(v, "hello") == [4]
    assert bert_tokenize(v, "hello world") == [4, 5]


def test_continuation_pieces():
    v = make_vocab()
    # "helloworld" -> "hello" + no "##world"... -> greedy pieces
    assert bert_tokenize(v, "unbreakable") == [23, 24, 25]


def test_punctuation_split():
    v = make_vocab()
    assert bert_tokenize(v, "hello, world!") == [4, 12, 5, 14]


def test_digits_split_from_letters():
    v = make_vocab()
    # regex splits alpha and digit runs: "a12" -> "a" + "12"
    assert bert_tokenize(v, "a12") == [16, 22]


def test_no_lowercasing():
    v = make_vocab()
    # "Hello" != "hello": 'H' unknown -> skipped, then continuation pieces
    toks = bert_tokenize(v, "Hello")
    assert toks == [v.token_to_id["##llo"]] or toks[0] != 4


def test_non_ascii_dropped():
    v = make_vocab()
    # codepoints outside ASCII classes never reach wordpiece
    assert bert_tokenize(v, "日本 hello") == [4]


def test_accent_fold_feeds_tokenizer():
    v = make_vocab()
    assert bert_tokenize(v, "héllo") == [4]


def test_unknown_char_skipped_sets_continuation():
    v = make_vocab()
    # 'x' unknown: skipped; rest matches continuations of the same word
    toks = bert_tokenize(v, "xhello")
    assert toks == [v.token_to_id["##llo"]]  # ##h unknown, ##e unknown...


def test_prompt_layout_513():
    v = make_vocab()
    p = bark_context_default_params()
    prompt = tokenize_input(v, "hello world", p)
    assert len(prompt) == 513
    assert prompt[0] == 4 + p.text_encoding_offset
    assert prompt[1] == 5 + p.text_encoding_offset
    assert all(t == p.text_pad_token for t in prompt[2:256])
    assert all(t == p.semantic_pad_token for t in prompt[256:512])
    assert prompt[512] == p.semantic_infer_token


def test_prompt_empty_text():
    v = make_vocab()
    p = bark_context_default_params()
    prompt = tokenize_input(v, "", p)
    assert len(prompt) == 513
    assert all(t == p.text_pad_token for t in prompt[:256])


def test_max_tokens_cap():
    v = make_vocab()
    long_text = "hello " * 500
    toks = bert_tokenize(v, long_text, n_max_tokens=256)
    assert len(toks) <= 255  # reference stops at n_max_tokens-1
