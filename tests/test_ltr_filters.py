"""FiLTR precision filter substack: unit tests with true/false positive pairs.

Covers the four reference filters (SURVEY.md §3.4 / VERDICT round-1 #3):
recombination filter (FiLTR src/Util.py:7099-7138), remove_dirty_LTR
(src/Util.py:7140-7180), flank-homogeneity cluster filters
(utils/data_util.py:2792+, src/LTR_filter.py:72-103) and the single-copy
TSD+intact-protein gate (src/Util.py:5955+, LTR_filter.py:702-726).
"""

import os

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.ltr import (
    LTRRecord, recombination_filter, remove_dirty_records)
from hite_tpu.pipeline.ltr_deep import (
    FRAME_CORE, FRAME_FLANK, flank_homogeneity_ok, single_copy_gate)


def _rec(s, e, ls, le, rs, re, tsd=0):
    return LTRRecord(start=s, end=e, lltr_start=ls, lltr_end=le,
                     rltr_start=rs, rltr_end=re, identity=0.95,
                     insert_time=0.0, tsd_len=tsd)


# --------------------------------------------------------------- dirty LTR
def test_remove_dirty_records_drops_container():
    outer = _rec(1000, 12_000, 1000, 1500, 11_500, 12_000)
    inner = _rec(3000, 8000, 3000, 3400, 7600, 8000)   # inside outer interior
    clean = _rec(20_000, 26_000, 20_000, 20_400, 25_600, 26_000)
    kept = remove_dirty_records([outer, inner, clean])
    starts = {r.start for r in kept}
    assert 1000 not in starts          # outer contains inner -> dirty
    assert {3000, 20_000} <= starts    # inner + unrelated survive


# ------------------------------------------------------------ recombination
def test_recombination_filter_drops_terminal_in_internal():
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 4, 40_000).astype(np.uint8)
    term = rng.integers(0, 4, 300).astype(np.uint8)

    # bad element: internal carries a ~full copy of its own left terminal
    bg[2000:2300] = term                     # left LTR
    bg[4000:4300] = term                     # inside the internal region
    bg[9000:9300] = term                     # right LTR
    bad = _rec(2000, 9300, 2000, 2300, 9000, 9300)

    # good element: internal is random
    term2 = rng.integers(0, 4, 300).astype(np.uint8)
    bg[20_000:20_300] = term2
    bg[27_000:27_300] = term2
    good = _rec(20_000, 27_300, 20_000, 20_300, 27_000, 27_300)

    genome = Genome.from_dict({"chr1": bg})
    cfg = PipelineConfig()
    kept = recombination_filter(genome, [bad, good], cfg)
    assert [r.start for r in kept] == [20_000]


# ------------------------------------------------------- flank homogeneity
def _frame(rows):
    width = 2 * (FRAME_FLANK + FRAME_CORE)
    M = np.full((len(rows), width), 4, np.uint8)
    for i, (lflank, rflank) in enumerate(rows):
        M[i, :FRAME_FLANK] = lflank
        M[i, FRAME_FLANK:-FRAME_FLANK] = 0     # element interior columns
        M[i, -FRAME_FLANK:] = rflank
    return M


def test_flank_homogeneity_random_flanks_kept():
    rng = np.random.default_rng(5)
    rows = [(rng.integers(0, 4, FRAME_FLANK), rng.integers(0, 4, FRAME_FLANK))
            for _ in range(8)]
    assert flank_homogeneity_ok(_frame(rows))


def test_flank_homogeneity_one_side_homogeneous_dropped():
    rng = np.random.default_rng(6)
    shared = rng.integers(0, 4, FRAME_FLANK)
    rows = [(shared.copy(), rng.integers(0, 4, FRAME_FLANK))
            for _ in range(8)]                 # truncated-terminal signature
    assert not flank_homogeneity_ok(_frame(rows))


def test_flank_homogeneity_joined_cluster_dropped():
    rng = np.random.default_rng(7)
    # 2 pairs of rows with identical joined flanks (4/6 = 67% per side, under
    # the 80% per-side threshold) + 2 random rows: homo 4 >= random 2 -> drop
    rows = []
    for _ in range(2):
        l = rng.integers(0, 4, FRAME_FLANK)
        r = rng.integers(0, 4, FRAME_FLANK)
        rows.append((l, r))
        rows.append((l.copy(), r.copy()))
    for _ in range(2):
        rows.append((rng.integers(0, 4, FRAME_FLANK),
                     rng.integers(0, 4, FRAME_FLANK)))
    assert not flank_homogeneity_ok(_frame(rows))


def test_flank_homogeneity_single_row_dropped():
    rng = np.random.default_rng(8)
    rows = [(rng.integers(0, 4, FRAME_FLANK), rng.integers(0, 4, FRAME_FLANK))]
    assert not flank_homogeneity_ok(_frame(rows))


# ------------------------------------------------------- single-copy gate
def test_single_copy_gate_structure_and_protein():
    from hite_tpu.ops.protein import decode_protein
    from hite_tpu.pipeline.domain import read_protein_fasta
    from hite_tpu.io.fasta import encode_seq
    from tests.test_rescue import CODON, TIRPEPS

    rng = np.random.default_rng(9)
    bg = rng.integers(0, 4, 30_000).astype(np.uint8)

    # candidate with an intact TIR transposase inside -> disqualified
    has_tir_protein = os.path.exists(TIRPEPS)
    if has_tir_protein:
        lib = read_protein_fasta(TIRPEPS)
        name, prot_codes = min(lib.items(),
                               key=lambda kv: abs(len(kv[1]) - 160))
        nt = encode_seq("".join(CODON.get(a, "GCA")
                                for a in decode_protein(prot_codes)))
        bg[6_000 : 6_000 + len(nt)] = nt

    # the protein half of the gate (FiLTR LTR_filter.py:702-726): plant
    # an RT-core peptide ([LIVM]PQG .. YVDD grammar) inside with_tsd's
    # internal region only — TSD-only candidates must now be dropped
    rt_pep = "MA" + "LPQG" + "KTDSWPEARLVING" * 3 + "YVDD" + "ILAT"
    rt_nt = encode_seq("".join(CODON.get(a, "GCA") for a in rt_pep))
    bg[2_000 : 2_000 + len(rt_nt)] = rt_nt

    genome = Genome.from_dict({"chr1": bg})
    cfg = PipelineConfig()
    with_tsd = _rec(1000, 4000, 1000, 1300, 3700, 4000, tsd=5)
    no_tsd = _rec(11_000, 14_000, 11_000, 11_300, 13_700, 14_000, tsd=0)
    tir_inside = _rec(5_500, 9_000, 5_500, 5_800, 8_700, 9_000, tsd=5)
    multi = _rec(21_000, 24_000, 21_000, 21_300, 23_700, 24_000, tsd=0)
    tsd_no_prot = _rec(15_000, 18_000, 15_000, 15_300, 17_700, 18_000, tsd=5)

    records = [with_tsd, no_tsd, tir_inside, multi, tsd_no_prot]
    keep = single_copy_gate(genome, records, [1, 1, 1, 4, 1], cfg)
    assert keep[0]          # single copy + TSD + RT protein -> kept
    assert not keep[1]      # single copy, no TSD -> dropped
    if has_tir_protein:
        assert not keep[2]  # other-class protein inside -> dropped
    assert keep[3]          # >=2 copies: gate does not apply
    assert not keep[4]      # TSD but NO intact LTR protein -> dropped
