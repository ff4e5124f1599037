"""2-bit genome packing codec tests (host oracle + device unpack)."""

import numpy as np
import jax.numpy as jnp

from hite_tpu.ops.pack2 import pack_codes, unpack_codes, unpack_device


def test_roundtrip_host_and_device():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 5, 100_003).astype(np.uint8)  # incl. N
    # pad to a multiple of 8 like device_flat_padded's pow2 buffer
    L = len(codes)
    Lp = -(-L // 8) * 8
    buf = np.full(Lp, 4, np.uint8)
    buf[:L] = codes
    packed, nmask, _ = pack_codes(buf)
    assert packed.nbytes + nmask.nbytes <= buf.nbytes * 3 // 8 + 8  # 3 bits/bp
    back = unpack_codes(packed, nmask, Lp)
    assert np.array_equal(back, buf)
    dev = np.asarray(unpack_device(jnp.asarray(packed), jnp.asarray(nmask)))
    assert np.array_equal(dev[:Lp], buf)


def test_device_flat_padded_packs():
    from hite_tpu.genome import Genome

    rng = np.random.default_rng(6)
    g = Genome.from_dict(
        {"c1": rng.integers(0, 4, 70_000).astype(np.uint8),
         "c2": rng.integers(0, 4, 50_000).astype(np.uint8)})
    flat_d, L = g.device_flat_padded()
    host = np.asarray(flat_d)
    assert L == len(g.flat)
    assert np.array_equal(host[:L], g.flat)
    assert (host[L:] == 4).all()
    # masked variant rebuilds through the packed path too
    g.init_mask()
    g.mask_intervals([(100, 200)])
    md, _ = g.device_flat_padded(use_masked=True)
    m = np.asarray(md)
    assert (m[100:200] == 4).all()
    assert np.array_equal(m[:100], g.flat[:100])
