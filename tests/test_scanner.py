"""DFA correctness: Aho-Corasick walk == naive substring counting."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from langid_py_spark.core.model import NBModel
from langid_py_spark.core.ngrams import count_features_naive
from langid_py_spark.core.scanner import build_dfa, walk_states_single


def fv_via_dfa(features, data: bytes) -> np.ndarray:
    dfa = build_dfa(features)
    m = NBModel.from_dfa(
        dfa,
        nb_ptc=np.zeros((len(features), 2)),
        nb_pc=np.zeros(2),
        classes=["a", "b"],
        features=features,
    )
    return m.batch_fv([data])[0]


def test_simple_overlap():
    feats = [b"ab", b"abc", b"b", b"bc", b"c"]
    data = b"abcabc"
    got = fv_via_dfa(feats, data)
    assert got.tolist() == count_features_naive(data, feats)


def test_suffix_outputs_via_fail_chain():
    # "aaa" contains "a" 3x, "aa" 2x, "aaa" 1x
    feats = [b"a", b"aa", b"aaa"]
    got = fv_via_dfa(feats, b"aaa")
    assert got.tolist() == [3, 2, 1]


def test_walk_single_matches_batch():
    feats = [b"th", b"he", b"the", b"e"]
    dfa = build_dfa(feats)
    data = b"the theme thesis"
    states = walk_states_single(dfa, data)
    assert len(states) == len(data)
    # expansion identical to naive
    got = fv_via_dfa(feats, data)
    assert got.tolist() == count_features_naive(data, feats)


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    feats=st.lists(
        st.binary(min_size=1, max_size=4), min_size=1, max_size=30, unique=True
    ),
)
def test_dfa_equals_naive_property(data, feats):
    feats = sorted(feats)
    got = fv_via_dfa(feats, data)
    assert got.tolist() == count_features_naive(data, feats)
