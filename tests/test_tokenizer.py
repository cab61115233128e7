"""Tokenizer golden table + the M3≡M4 equivalence property (SURVEY.md §5.1)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uci_searchengine_ray.functions.tokenizer import (
    STOPWORDS,
    get_token_frequencies,
    process_text,
    tokenize_code,
    tokenize_reference,
)

GOLDEN = [
    # (text, expected reference-mode tokens)
    ("Hello World", ["hello", "world"]),
    ("Hello, World!", ["hello", "world"]),
    ("  multiple   spaces\t\nhere ", ["multiple", "spaces", "here"]),
    ("snake_case_name stays", ["snake_case_name", "stays"]),
    ("camelCaseName lowers", ["camelcasename", "lowers"]),
    ("digits123 and 456", ["digits123", "and", "456"]),
    ("naïve übung", ["naïve", "übung"]),  # \w is unicode in Python
    ("", []),
    ("   ", []),
    ("!!! ... ???", []),
    ("a-b c.d", ["a", "b", "c", "d"]),
    ("x_1 __init__", ["x_1", "__init__"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_reference_golden(text, expected):
    assert tokenize_reference(text) == expected


def _tokenize_ref_canonical(text):
    """Literal transcription of reference tokenizer.py:5-9 (M3)."""
    text = text.lower()
    text = re.sub(r"[^\w\s]", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.split()


def _tokenize_ref_crawler(text):
    """Literal transcription of reference crawler.py:420-421 (M4)."""
    return [word.lower() for word in re.findall(r"\w+", text)]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_m3_m4_equivalence(text):
    """The two reference tokenizers and ours produce identical sequences."""
    ours = tokenize_reference(text)
    assert ours == _tokenize_ref_canonical(text)
    assert ours == _tokenize_ref_crawler(text)


CODE_GOLDEN = [
    ("camelCase", ["camel", "case"]),
    ("HTTPServer", ["http", "server"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("parseJSON2 value", ["parse", "json", "2", "value"]),
    ("the return of self", ["return", "self"]),  # stopwords dropped
    ("getValue_fromDB", ["get", "value", "db"]),  # "from" is a stopword
    ("", []),
]


@pytest.mark.parametrize("text,expected", CODE_GOLDEN)
def test_code_golden(text, expected):
    assert tokenize_code(text) == expected


def test_stopwords_not_in_code_output():
    toks = tokenize_code("the quick Fox AND the_lazy_dog")
    assert not (set(toks) & STOPWORDS)


def test_frequencies():
    assert process_text("a b a. A!") == {"a": 3, "b": 1}
    assert get_token_frequencies([]) == {}


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_code_fulltext_split_equals_per_token_split(text):
    """tokenize_code's single full-text findall must equal the definitional
    per-\\w-token subtoken split (no _SUBTOKEN_RE match can span a non-word
    gap, and the (?![a-z]) lookahead resolves identically at raw-token
    boundaries)."""
    from uci_searchengine_ray.functions.tokenizer import (
        STOPWORDS,
        _SUBTOKEN_RE,
        _WORD_RE,
        tokenize_code,
    )

    per_token = [
        low
        for raw in _WORD_RE.findall(text)
        for low in map(str.lower, _SUBTOKEN_RE.findall(raw))
        if low not in STOPWORDS
    ]
    assert tokenize_code(text) == per_token
