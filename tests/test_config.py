"""Parameter validation parity (difPy O22, dif.py:807-944)."""

from __future__ import annotations

import pytest

from sparkdedup.config import DedupConfig


def test_similarity_mapping():
    assert DedupConfig(similarity="duplicates").threshold == 0.0
    assert DedupConfig(similarity="similar").threshold == 0.30
    assert DedupConfig(similarity=0.15).threshold == 0.15
    assert DedupConfig(similarity=2).threshold == 2.0


def test_legacy_similarity_rejected():
    with pytest.raises(Exception, match="difPy v3.0.8"):
        DedupConfig(similarity="low")


def test_negative_similarity():
    with pytest.raises(Exception, match="must be >= 0"):
        DedupConfig(similarity=-0.5)


def test_bad_similarity_string():
    with pytest.raises(Exception, match="duplicates"):
        DedupConfig(similarity="nope")


def test_bool_params_type_checked():
    for name in ("recursive", "in_folder", "limit_extensions",
                 "containment", "same_dim"):
        with pytest.raises(Exception, match="must be of type BOOL"):
            DedupConfig(**{name: "yes"})


def test_signature_bounds():
    with pytest.raises(Exception, match="shingle_k"):
        DedupConfig(shingle_k=1)
    with pytest.raises(Exception, match="num_perm"):
        DedupConfig(num_perm=4)
    with pytest.raises(Exception, match="num_bands"):
        DedupConfig(num_perm=100, num_bands=32)


def test_processes_and_chunksize():
    with pytest.raises(Exception, match="processes"):
        DedupConfig(processes=0)
    with pytest.raises(Exception, match="chunksize"):
        DedupConfig(chunksize=0)
    with pytest.raises(Exception, match="INT or None"):
        DedupConfig(chunksize="big")
    DedupConfig(processes=2, chunksize=100)  # valid
    # reference parity (dif.py:902-910): one above cpu_count is rejected
    # with the reference's own error message
    import os
    with pytest.raises(Exception, match="number of CPU cores"):
        DedupConfig(processes=(os.cpu_count() or 1) + 1)


def test_duplicate_tables_rejected():
    with pytest.raises(ValueError, match="compare a directory with itself"):
        DedupConfig(tables=("t", "t"))


def test_params_hash_stable_and_sensitive():
    a = DedupConfig(similarity="similar")
    b = DedupConfig(similarity="similar")
    c = DedupConfig(similarity="similar", shingle_k=9)
    assert a.params_hash() == b.params_hash()
    assert a.params_hash() != c.params_hash()
    # execution-only knobs don't change semantics
    d = DedupConfig(similarity="similar", processes=4)
    assert a.params_hash() == d.params_hash()
