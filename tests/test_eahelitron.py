"""EAHelitron-equivalent structure scanner tests (ops/eahelitron.py).

Oracle: a direct nested-loop implementation of the reference Perl regex
semantics (bin/EAHelitron-master/EAHelitron `$testseq`/`$TCseq` with HiTE's
`-T "ATC" -r 3` invocation, Util.py:143).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hite_tpu.io.fasta import encode_seq
from hite_tpu.ops.eahelitron import (
    GAP_MAX, GAP_MIN, LEAD, STEM_PATTERNS, hel3_scan, select_pairs, tc5_scan)


def _cls_ok(c, cls):
    return (c in (1, 2)) if cls == "S" else (c in (0, 3))


def oracle_hel3(c: np.ndarray) -> set:
    """All CTRRT-start positions completing a 3' structure (fuzzy level 3)."""
    L = len(c)
    acgt = c < 4
    hits = set()
    for i in range(L):
        if i < LEAD or not acgt[i - LEAD : i].all():
            continue
        for pat in STEM_PATTERNS:
            s = len(pat)
            if i + 2 * s + 1 > L:
                continue
            if not all(_cls_ok(c[i + j], pat[j]) for j in range(s)):
                continue
            for loop in range(1, 10):
                e = i + 2 * s + loop          # hairpin end (exclusive)
                if e > L:
                    continue
                lo, hi = max(0, loop - 5), min(4, loop - 1)
                lb = c[i + s : i + s + loop]
                if not (lb < 4).all():
                    continue
                if not any(lb[a] in (0, 3) for a in range(lo, hi + 1)):
                    continue
                rc_ok = all(
                    c[i + s + loop + j] < 4
                    and c[i + s - 1 - j] == 3 - c[i + s + loop + j]
                    for j in range(s))
                if not rc_ok:
                    continue
                for g in range(GAP_MIN, GAP_MAX + 1):
                    t = e + g                  # CTRRT start
                    if t + 5 > L or not acgt[e:t].all():
                        continue
                    if (c[t] == 1 and c[t + 1] == 3 and c[t + 2] in (0, 2)
                            and c[t + 3] in (0, 2) and c[t + 4] == 3):
                        hits.add(t)
    return hits


def _scan_rows(mat):
    return np.asarray(hel3_scan(jnp.asarray(mat)))


def test_planted_structure():
    # stem GCGCWS-class: use GCGCAG (SSSSWS), loop TAT, rc stem, gap, CTAGT
    stem = "GCGCAG"
    loop = "TAT"
    rc = "CTGCGC"
    seq = ("GATTACAGAT" + "ACGTACGTAC"          # >=10bp clean lead
           + stem + loop + rc + "ACGT" + "CTAGT" + "ACGTAAGG")
    c = encode_seq(seq)
    hits = oracle_hel3(c)
    assert len(hits) >= 1
    got = _scan_rows(c[None, :])
    assert set(np.nonzero(got[0])[0]) == hits


def test_matches_oracle_on_random():
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 4, size=(8, 400)).astype(np.uint8)
    mat[2, 50:60] = 4                            # embed some Ns
    got = _scan_rows(mat)
    for r in range(mat.shape[0]):
        assert set(np.nonzero(got[r])[0]) == oracle_hel3(mat[r]), r


def test_tc5_scan():
    c = encode_seq("GGGGGATCAAAAAAAAAAAAAAAAAAAAAAAA")
    got = np.asarray(tc5_scan(jnp.asarray(c[None, :])))
    assert got[0, 5] and got[0].sum() == 1


def test_select_pairs_prefers_raw_boundaries():
    L = 300
    hel3 = np.zeros((1, L), bool)
    tc5 = np.zeros((1, L), bool)
    hel3[0, 200] = True      # end = 205
    hel3[0, 250] = True      # end = 255
    tc5[0, 40] = True
    tc5[0, 100] = True
    lens = np.array([L])
    picks = select_pairs(hel3, tc5, lens, np.array([50]), np.array([210]))
    assert picks[0] == (40, 205)


def test_pipeline_gate():
    from hite_tpu.config import PipelineConfig
    from hite_tpu.genome import synthetic_genome
    from hite_tpu.pipeline.helitron import eahelitron_gate

    stem, loop, rc = "GCGCAG", "TAT", "CTGCGC"
    hel = ("ATC" + "TGCAGGTTACGATTGCCTAGCGGATCGATT" * 6
           + "ACGTACGTAC" + stem + loop + rc + "ACGT" + "CTAGT")
    genome, inserts = synthetic_genome(
        20_000, [hel], [3], seed=3, mutation_rate=0.0)
    cfg = PipelineConfig()
    intervals = np.array([[s, e] for s, e, _ in inserts], np.int64)
    got = eahelitron_gate(genome, intervals, cfg)
    assert len(got) >= 1
    # each reported span must end with CTRRT and start at an ATC
    for s, e in got:
        seq = genome.extract_str(int(s), int(e))
        assert seq[:3] == "ATC"
        assert seq[-5] == "C" and seq[-4] == "T" and seq[-1] == "T"
