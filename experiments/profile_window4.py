"""Window-build variants at the long-ref shape (round 5).

The byte-packed window build (`_diag_windows_packed4`) is a stack of M
per-column word slices; at the 131 kb fold shape (C=8, T4=33024, M=256,
269 MB) the jitted build measures ~26 ms (~10 GB/s effective) — as long
as the folded kernel itself.  Variants:

  a) shipped: stack(axis=2) -> (C, T4, M)
  b) transposed build: stack(axis=1) -> (C, M, T4) (every row a
     CONTIGUOUS word slice), then swapaxes to (C, T4, M) — the relayout
     is a minor-dim transpose XLA handles natively.

Run: python experiments/profile_window4.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops import pallas_score as ps

_BASES = np.array(list("ACGT"))


def _fence(x):
    return np.asarray(x.ravel()[:1])


def timed(fn, iters=8, warm=2):
    for _ in range(warm):
        _fence(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _build_transposed(refs_i, m, t4, ilv):
    c, n = refs_i.shape
    l_total = (m - 1) + 4 * t4
    w = -(-l_total // 4)
    pad_byte = jnp.int32(1)
    padded = jnp.pad(
        refs_i, ((0, 0), (m - 1, 4 * w - n - (m - 1))),
        constant_values=pad_byte,
    ).astype(jnp.uint32)
    parts = [
        jax.lax.slice_in_dim(padded, k, 4 * w, stride=4, axis=1)
        for k in range(4)
    ]
    p4 = parts[0] | (parts[1] << 8) | (parts[2] << 16) | (parts[3] << 24)
    p4 = jnp.pad(p4, ((0, 0), (0, 1)), constant_values=jnp.uint32(0x01010101))
    h = m // 128
    order = (
        [(p % 128) * h + p // 128 for p in range(m)]
        if ilv and m % 128 == 0 and h > 1
        else range(m)
    )
    cols = []
    for i in order:
        x = m - 1 - i
        r = x % 4
        q0 = x // 4
        a = jax.lax.slice_in_dim(p4, q0, q0 + t4, axis=1)
        if r == 0:
            col = a
        else:
            b = jax.lax.slice_in_dim(p4, q0 + 1, q0 + 1 + t4, axis=1)
            col = (a >> (8 * r)) | (b << (32 - 8 * r))
        cols.append(col)
    stacked = jnp.stack(cols, axis=1)  # (C, M, T4): rows contiguous
    return jnp.swapaxes(stacked, 1, 2).astype(jnp.int32)


def main():
    enable_compile_cache()
    rng = np.random.default_rng(5)
    refs = ["".join(rng.choice(_BASES, size=131_072)) for _ in range(8)]
    m, t4 = 256, 33024
    refs_enc = jax.device_put(encode_batch(refs, 131_072, REF_PAD))

    ship = jax.jit(
        lambda r: ps._diag_windows_packed4(r.astype(jnp.int32), m, t4, True)
    )
    trans = jax.jit(
        lambda r: _build_transposed(r.astype(jnp.int32), m, t4, True)
    )
    t_a = timed(lambda: ship(refs_enc))
    t_b = timed(lambda: trans(refs_enc))
    gb = 8 * t4 * m * 4 / 1e9
    print(f"a) shipped stack axis=2: {t_a*1e3:.1f} ms ({gb/t_a:.1f} GB/s)")
    print(f"b) transposed + swap:    {t_b*1e3:.1f} ms ({gb/t_b:.1f} GB/s)")
    wa = ship(refs_enc)
    wb = trans(refs_enc)
    ok = bool(jnp.array_equal(wa, wb))
    print(f"equal: {ok}")




def main2():
    """Shear-vs-column build at the long-ref and e2e varlen shapes."""
    enable_compile_cache()
    rng = np.random.default_rng(5)
    for tag, c, n, m, t4 in (
        ("longref", 8, 131_072, 256, 33024),
        ("e2e", 72, 4000, 256, 1088),
    ):
        refs = ["".join(rng.choice(_BASES, size=n)) for _ in range(c)]
        refs_enc = jax.device_put(encode_batch(refs, n, REF_PAD))
        ship = jax.jit(
            lambda r, m=m, t4=t4: ps._diag_windows_packed4(
                r.astype(jnp.int32), m, t4, True
            )
        )
        shear = jax.jit(
            lambda r, m=m, t4=t4: ps._diag_windows_packed4_shear(
                r.astype(jnp.int32), m, t4, True
            )
        )
        t_a = timed(lambda: ship(refs_enc))
        t_b = timed(lambda: shear(refs_enc))
        gb = c * t4 * m * 4 / 1e9
        eq = bool(jnp.array_equal(ship(refs_enc), shear(refs_enc)))
        print(
            f"{tag}: column {t_a*1e3:.1f} ms ({gb/t_a:.1f} GB/s) | "
            f"shear {t_b*1e3:.1f} ms ({gb/t_b:.1f} GB/s) | equal={eq}"
        )


def main3():
    """EAGER column build (the shipped pre-round-5 form: ~770 individual
    op dispatches, device executes them as small copy kernels) vs the
    jitted column and shear forms."""
    enable_compile_cache()
    rng = np.random.default_rng(5)
    for tag, c, n, m, t4 in (
        ("longref", 8, 131_072, 256, 33024),
        ("e2e", 72, 4000, 256, 1088),
    ):
        refs = ["".join(rng.choice(_BASES, size=n)) for _ in range(c)]
        refs_dev = jax.device_put(
            jnp.asarray(encode_batch(refs, n, REF_PAD), jnp.int32)
        )
        _fence(refs_dev)

        def eager(refs_dev=refs_dev, m=m, t4=t4):
            return ps._diag_windows_packed4(refs_dev, m, t4, True)

        t_c = timed(eager, iters=5)
        print(f"{tag}: EAGER column build {t_c*1e3:.1f} ms")


if __name__ == "__main__":
    import sys
    if "--eager" in sys.argv:
        main3()
        raise SystemExit(0)
    if "--shear" in sys.argv:
        main2()
        raise SystemExit(0)
    main()
