"""Structure scanner tests: terminal repeats, TSD, tails, tandem filter."""

import numpy as np
import jax.numpy as jnp

from hite_tpu.io.fasta import encode_seq
from hite_tpu.ops.terminal import batched_local_align, find_terminal_repeat
from hite_tpu.ops.tsd import tsd_search
from hite_tpu.ops.tail import tail_scan
from hite_tpu.ops.tandem import long_tandem_mask, tandem_mask, tandem_fraction


def _rand(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)


def test_local_align_exact_match():
    rng = np.random.default_rng(0)
    core = _rand(rng, 20)
    a = np.concatenate([_rand(rng, 10), core, _rand(rng, 10)])
    b = np.concatenate([_rand(rng, 5), core, _rand(rng, 15)])
    al = batched_local_align(jnp.asarray(a[None]), jnp.asarray(b[None]))
    assert int(al.matches[0]) >= 20
    assert int(al.qs[0]) <= 10 and int(al.qe[0]) >= 30
    assert int(al.ss[0]) <= 5 and int(al.se[0]) >= 25
    ident = float(al.matches[0]) / float(al.alen[0])
    assert ident > 0.9


def test_find_tir():
    rng = np.random.default_rng(1)
    tir = _rand(rng, 15)
    rc = (3 - tir)[::-1].astype(np.uint8)
    interior = _rand(rng, 200)
    seq = np.concatenate([tir, interior, rc])
    L = len(seq)
    padded = np.full((1, 256), 4, np.uint8)
    padded[0, :L] = seq
    tr = find_terminal_repeat(jnp.asarray(padded), jnp.asarray([L]),
                              inverted=True, window=40)
    assert bool(tr.found[0])
    assert int(tr.left_start[0]) == 0 and int(tr.left_end[0]) == 15
    assert int(tr.right_start[0]) == L - 15 and int(tr.right_end[0]) == L
    assert float(tr.identity[0]) == 1.0


def test_find_ltr_pair():
    rng = np.random.default_rng(2)
    ltr = _rand(rng, 30)
    seq = np.concatenate([ltr, _rand(rng, 300), ltr])
    L = len(seq)
    padded = np.full((1, 512), 4, np.uint8)
    padded[0, :L] = seq
    tr = find_terminal_repeat(jnp.asarray(padded), jnp.asarray([L]),
                              inverted=False, window=40, min_identity=0.85,
                              min_len=20)
    assert bool(tr.found[0])
    assert int(tr.left_start[0]) == 0
    assert int(tr.right_end[0]) == L


def test_tir_absent_in_random():
    rng = np.random.default_rng(3)
    found = 0
    seqs = np.stack([np.concatenate([_rand(rng, 300)]) for _ in range(8)])
    tr = find_terminal_repeat(jnp.asarray(seqs), jnp.asarray([300] * 8),
                              inverted=True, window=40, min_len=10)
    # random 40bp windows rarely share a >=10bp 70% inverted repeat
    assert int(np.sum(np.asarray(tr.found))) <= 2


def test_tsd_search_exact():
    rng = np.random.default_rng(4)
    R = 30
    tsd = _rand(rng, 5)
    left = np.concatenate([_rand(rng, R - 5), tsd])      # TSD flush to boundary
    right = np.concatenate([tsd, _rand(rng, R - 5)])
    hit = tsd_search(jnp.asarray(left[None]), jnp.asarray(right[None]),
                     sizes=(5,), plant=False)
    assert bool(hit.found[0, 0])
    assert int(hit.left_pos[0, 0]) == R - 5
    assert int(hit.right_pos[0, 0]) == 0
    assert int(hit.mismatches[0, 0]) == 0
    assert int(hit.dist[0, 0]) == 0


def test_tsd_size2_requires_TA():
    R = 20
    left = np.zeros((1, R), np.uint8)                    # all A
    right = np.zeros((1, R), np.uint8)
    hit = tsd_search(jnp.asarray(left), jnp.asarray(right), sizes=(2,))
    assert not bool(hit.found[0, 0])                     # AA is not TA
    left2 = left.copy()
    right2 = right.copy()
    left2[0, -2:] = [3, 0]                               # ...TA|
    right2[0, :2] = [3, 0]                               # |TA...
    hit2 = tsd_search(jnp.asarray(left2), jnp.asarray(right2), sizes=(2,))
    assert bool(hit2.found[0, 0])


def test_tail_scan():
    seq = np.concatenate([np.random.default_rng(5).integers(0, 4, 100),
                          np.zeros(12)]).astype(np.uint8)  # polyA tail
    tc = tail_scan(jnp.asarray(seq[None]), jnp.asarray([len(seq)]))
    assert int(tc.polya_len[0]) >= 12
    ac = np.tile([0, 1], 15).astype(np.uint8)             # ACAC... tail
    seq2 = np.concatenate([np.random.default_rng(6).integers(0, 4, 100), ac]).astype(np.uint8)
    tc2 = tail_scan(jnp.asarray(seq2[None]), jnp.asarray([len(seq2)]))
    assert int(tc2.tandem_len[0]) >= 20


def test_tandem_mask_and_fraction():
    rng = np.random.default_rng(7)
    seq = _rand(rng, 300)
    seq[100:180] = np.tile([0, 1], 40)                    # ACAC island
    m = np.asarray(tandem_mask(jnp.asarray(seq[None])))
    assert m[0, 120:160].mean() > 0.9
    assert m[0, :80].mean() < 0.2
    frac = np.asarray(tandem_fraction(jnp.asarray(seq[None]), jnp.asarray([300])))
    assert 0.15 < frac[0] < 0.5


def test_long_tandem_mask():
    rng = np.random.default_rng(11)
    unit = _rand(rng, 200)                                # period-200 array
    seq = np.concatenate([_rand(rng, 400), np.tile(unit, 4), _rand(rng, 400)])
    m = np.asarray(long_tandem_mask(jnp.asarray(seq)))
    arr = slice(400, 400 + 800)
    assert m[arr].mean() > 0.85                           # array masked
    assert m[:350].mean() < 0.05                          # flanks untouched
    assert m[-350:].mean() < 0.05
    # period 200 is invisible to the short-period kernel
    ms = np.asarray(tandem_mask(jnp.asarray(seq)[None]))[0]
    assert ms[arr].mean() < 0.2
    # batch form: padded N rows stay unmasked
    batch = np.stack([seq, np.full_like(seq, 4)])
    mb = np.asarray(long_tandem_mask(jnp.asarray(batch)))
    assert mb[0, arr].mean() > 0.85 and not mb[1].any()
