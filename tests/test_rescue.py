"""Low-copy domain rescue wiring test (vendored TIRPeps library)."""

import os

import numpy as np
import pytest

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.candidates import CandidateSet
from hite_tpu.pipeline.domain import read_protein_fasta
from hite_tpu.pipeline.run import DATA_DIR, _rescue_low_copy
from hite_tpu.pipeline.verify import ModuleResult

TIRPEPS = os.path.join(DATA_DIR, "protein", "TIRPeps.lib")

CODON = {"A": "GCA", "R": "CGA", "N": "AAC", "D": "GAC", "C": "TGC",
         "Q": "CAA", "E": "GAA", "G": "GGA", "H": "CAC", "I": "ATC",
         "L": "CTA", "K": "AAA", "M": "ATG", "F": "TTC", "P": "CCA",
         "S": "TCA", "T": "ACA", "W": "TGG", "Y": "TAC", "V": "GTA", "X": "GCA"}


@pytest.mark.skipif(not os.path.exists(TIRPEPS), reason="no vendored TIRPeps")
def test_rescue_low_copy_by_domain():
    from hite_tpu.ops.protein import AA_ORDER, decode_protein

    lib = read_protein_fasta(TIRPEPS)
    # pick a shortish entry and plant it WHOLE (entry coverage >= 95% needed)
    name, prot_codes = min(lib.items(), key=lambda kv: abs(len(kv[1]) - 160))
    prot = decode_protein(prot_codes)
    nt = "".join(CODON.get(a, "GCA") for a in prot)

    rng = np.random.default_rng(0)
    bg = rng.integers(0, 4, 20_000).astype(np.uint8)
    from hite_tpu.io.fasta import encode_seq
    dom = encode_seq(nt)
    bg[5_000 : 5_000 + len(dom)] = dom
    genome = Genome.from_dict({"chr1": bg})

    low = CandidateSet(intervals=np.array(
        [[4_900, 5_000 + len(dom) + 100],       # carries the domain
         [12_000, 12_600]]))                    # random, no domain
    mod = ModuleResult(
        accepted=CandidateSet(intervals=np.zeros((0, 2), np.int64)),
        consensus=[], low_copy=low, copy_counts=[])

    cfg = PipelineConfig()
    n = _rescue_low_copy(genome, cfg, tir=mod)
    assert n == 1
    assert len(mod.accepted) == 1
    assert len(mod.low_copy) == 1
    assert mod.low_copy.intervals[0, 0] == 12_000


def test_structural_rescue_tir():
    """Low-copy TIR candidates with terminal structure are rescued without
    any protein domain (reference Util.py:8205-8213 TRF+itrsearch branch)."""
    rng = np.random.default_rng(11)
    bg = rng.integers(0, 4, 30_000).astype(np.uint8)

    # candidate with clean 20bp inverted termini + 5bp TSD
    t = rng.integers(0, 4, 20).astype(np.uint8)
    te = np.concatenate([t, rng.integers(0, 4, 500).astype(np.uint8),
                         (3 - t)[::-1]])
    pos = 5_000
    tsd = rng.integers(0, 4, 5).astype(np.uint8)
    bg[pos - 5 : pos] = tsd
    bg[pos + len(te) : pos + len(te) + 5] = tsd
    bg[pos : pos + len(te)] = te

    # mostly-tandem junk with fake termini: tandem masking must kill it
    unit = rng.integers(0, 4, 6).astype(np.uint8)
    bg[12_000:12_600] = np.tile(unit, 100)

    genome = Genome.from_dict({"chr1": bg})
    low = CandidateSet(intervals=np.array(
        [[pos, pos + len(te)],
         [12_000, 12_600],
         [20_000, 20_600]]))                    # random: no structure
    mod = ModuleResult(
        accepted=CandidateSet(intervals=np.zeros((0, 2), np.int64)),
        consensus=[], low_copy=low, copy_counts=[])

    cfg = PipelineConfig()
    n = _rescue_low_copy(genome, cfg, tir=mod)
    assert n == 1
    assert len(mod.accepted) == 1
    assert mod.accepted.intervals[0, 0] == pos
