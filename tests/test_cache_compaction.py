"""Contact-cache width compaction (Capacity.cache_degree).

The broadphase provisions D candidate slots for the worst-case proximity
degree, but the realized near-contact degree is much smaller; pre-culling
the candidates to a narrower cache by the 6-face-axis separation test
BEFORE the 15-axis SAT (ops/replicated.precull_near) shrinks the
narrowphase, the warmstart match, and the solve loop.  Because the cull
preserves candidate order, only removes slots whose face-axis separation
proves the SAT must fail, and padded slots contribute exact zeros to
every masked reduction, a non-overflowing culled run must be
BIT-IDENTICAL to the full-width one — asserted here, along with honest
overflow accounting when the cache is provisioned too small.
"""

import numpy as np
import jax

from avbd3d_tpu.config import SolverParams
from avbd3d_tpu.models.scenes import SceneBuilder
from avbd3d_tpu.solver import step


def _pile(cache_degree):
    sb = SceneBuilder()
    sb.add_body((40, 1, 40), 0.0, 0.5, (0, -0.5, 0))
    rng = np.random.default_rng(3)
    for i in range(30):
        x, z = divmod(i, 6)
        sb.add_body(
            (1, 1, 1), 1.0, 0.5,
            (1.05 * x - 2.0 + 0.02 * float(rng.standard_normal()),
             0.55 + 1.05 * (i % 3),
             1.05 * z - 3.0 + 0.02 * float(rng.standard_normal())),
        )
    return sb.build(SolverParams(), max_degree=16, cache_degree=cache_degree)


def test_compacted_cache_matches_full_width_bit_exact():
    w0, p, c0, _ = _pile(0)    # cache width = max_degree (off)
    w1, _, c1, _ = _pile(12)   # compacted cache
    for _ in range(50):
        w0 = step(w0, p, c0)
        w1 = step(w1, p, c1)
    d0 = jax.device_get(w0.diagnostics)
    d1 = jax.device_get(w1.diagnostics)
    assert int(d1.degree_overflow) == 0
    assert int(d0.active_contacts) == int(d1.active_contacts)
    assert int(d0.active_manifolds) == int(d1.active_manifolds)
    np.testing.assert_array_equal(
        np.asarray(w0.bodies.pos), np.asarray(w1.bodies.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(w0.bodies.quat), np.asarray(w1.bodies.quat)
    )


def test_compaction_overflow_is_counted_not_silent():
    # A cache of width 1 under a 3-high stack: the middle cube carries 2
    # manifolds, so one must be dropped AND counted; the sim must stay
    # finite (no NaNs, no crash).
    sb = SceneBuilder()
    sb.add_body((40, 1, 40), 0.0, 0.5, (0, -0.5, 0))
    for k in range(3):
        sb.add_body((1, 1, 1), 1.0, 0.5, (0.0, 0.55 + 1.02 * k, 0.0))
    w, p, c, _ = sb.build(SolverParams(), max_degree=8, cache_degree=1)
    worst = 0
    for _ in range(40):
        w = step(w, p, c)
        worst = max(worst, int(jax.device_get(w.diagnostics).degree_overflow))
    d = jax.device_get(w.diagnostics)
    # The middle cube carries 2 manifolds while the stack holds, so some
    # step must report a dropped manifold (the stack then topples — with
    # one cache slot the kept contact alternates — and the final state may
    # legitimately fit the cache again).
    assert worst > 0
    assert int(d.sanitized) == 0
    assert np.isfinite(np.asarray(w.bodies.pos)).all()
