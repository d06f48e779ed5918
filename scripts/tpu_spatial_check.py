"""Device validation + throughput projection for shard_map spatial serving.

Two sections:

1. Mosaic-in-shard_map check (1-device mesh): GSPMD cannot partition
   Pallas custom calls, but under shard_map each shard's program is an
   ordinary single-device graph — this validates that the full kernel
   stack (tile-slab warps, HCW convs, planar tail, source-offset
   warps) COMPILES AND RUNS inside jax.shard_map on real Mosaic, and
   that the serving head/tail split matches the monolithic forward.

2. Per-shard slab timing (single chip, axis_name=None simulation):
   times the head (replicated part) and the per-shard program
   (head + tail-on-slab) for n in {2, 4} at lite 4K, and projects
   multi-chip fps as 1 / (t_shard + t_ici) with the ICI bytes from
   parallel.spatial.spatial_ici_bytes at an assumed 45 GB/s effective
   all-gather bandwidth (v5e ring). The collectives themselves cannot
   be measured on one chip — the projection is labeled as such.

Run (exclusive): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/tpu_spatial_check.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.models.network import Network as _Net
from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar
from atmvfi_tpu.parallel import make_mesh
from atmvfi_tpu.parallel.spatial import (
    make_spatial_forward,
    spatial_ici_bytes,
)

ICI_BYTES_PER_S = 45e9  # assumed effective all-gather BW (v5e ring)

print(f"device: {jax.devices()[0]}", flush=True)

cfg = get_config("lite", dtype=jnp.bfloat16)
net = Network(cfg)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(
    lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True)
)(dummy, dummy)
jax.block_until_ready(variables)

# ---------- 1. Mosaic-in-shard_map + split equality (1088x1920) ----------
H1, W1 = 1088, 1920
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
gen = jax.jit(lambda k1, k2: (
    jax.random.uniform(k1, (1, H1, W1, 3), jnp.float32),
    jnp.roll(jax.random.uniform(k1, (1, H1, W1, 3), jnp.float32),
             (8, -8), (1, 2)) * 0.7
    + 0.3 * jax.random.uniform(k2, (1, H1, W1, 3), jnp.float32),
))
x0, x1 = gen(k1, k2)

ref = jax.jit(
    lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"]
)(variables, x0, x1)
mesh1 = make_mesh((1, 1), jax.devices()[:1])
sfwd = jax.jit(make_spatial_forward(net, mesh1, margin=64))
out = sfwd(variables, x0, x1)
d = float(jnp.max(jnp.abs(out - ref)))
print(f"shard_map(1) spatial vs monolithic @ {H1}x{W1} bf16: "
      f"max|d| = {d:.3e}", flush=True)
assert d < 5e-2, "spatial shard_map diverges on device"


# ---------- 2. per-shard slab timing + projection (4K) ----------
def slab_geom(H, n, margin=96):
    h_loc = H // n
    m = min(margin, (n - 1) * h_loc, (H - h_loc) // 2)
    m = (m // 16) * 16
    h_slab = h_loc + 2 * m
    i = min(1, n - 1)
    s = min(max(i * h_loc - m, 0), H - h_slab)
    crop = i * h_loc - s
    return h_loc, h_slab, s, crop


def build_sim(H, W, n, margin=64):
    """Single-chip jit of ONE shard's SHALLOW program (head replicated
    + tail on the boundary-shifted slab of shard i=1)."""
    h_loc, h_slab, s, crop = slab_geom(H, n, margin)

    def f(v, a, b):
        feat, skips, gf0, gf1 = net.apply(
            v, a, b, global_motion=True, method=_Net.serving_head
        )
        feat_slab = feat[:, s // 2 : (s + h_slab) // 2]
        skips_slab = [
            skips[0][:, s // 4 : (s + h_slab) // 4],
            skips[1][:, s // 2 : (s + h_slab) // 2],
        ]
        return net.apply(
            v, feat_slab, skips_slab, nhwc_to_planar(a),
            nhwc_to_planar(b), gf0[:, s : s + h_slab],
            gf1[:, s : s + h_slab], jnp.int32(s), jnp.int32(crop),
            h_loc, None, method=_Net.serving_tail,
        )

    return f


from atmvfi_tpu.parallel.spatial import make_deep_shard_sim


def build_sim_deep(H, W, n, margin=96):
    """One shard's DEEP program on one chip (parallel/spatial.py
    make_deep_shard_sim — shared with bench.py's projection extras)."""
    return make_deep_shard_sim(net, H, W, n, margin)


def timed(f, v, a, b, iters):
    def chained(v, a, b):
        def body(tok, _):
            y = f(v, a + tok, b)
            return (
                (y[:1, :1, :1, :1] * 0.0).astype(jnp.float32),
                y.mean().astype(jnp.float32),
            )

        _, mres = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None,
                               length=iters)
        return mres.sum()

    cf = jax.jit(chained)
    float(cf(v, a, b))
    t0 = time.time()
    float(cf(v, a, b))
    return (time.time() - t0) / iters


H4, W4 = 2176, 3840
x0, x1 = jax.jit(lambda k1, k2: (
    jax.random.uniform(k1, (1, H4, W4, 3), jnp.float32),
    jnp.roll(jax.random.uniform(k1, (1, H4, W4, 3), jnp.float32),
             (8, -8), (1, 2)) * 0.7
    + 0.3 * jax.random.uniform(k2, (1, H4, W4, 3), jnp.float32),
))(k1, k2)
ITERS = 4

t_full = timed(
    lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"],
    variables, x0, x1, ITERS,
)
print(f"lite 4K monolithic: {t_full*1e3:.1f} ms/frame "
      f"= {1/t_full:.2f} fps", flush=True)

t_head = timed(
    lambda v, a, b: net.apply(
        v, a, b, global_motion=True, method=_Net.serving_head
    )[0],
    variables, x0, x1, ITERS,
)
print(f"lite 4K head (replicated part, shallow): {t_head*1e3:.1f} ms",
      flush=True)

# middle-alone time (the deep cut's replicated floor)
def middle_only(v, a, b):
    f8, g16 = net.apply(v, a, b, global_motion=True,
                        method=_Net.serving_front)
    dec_in, gf0, gf1 = net.apply(v, f8, g16, global_motion=True,
                                 method=_Net.serving_middle)
    return dec_in

t_frontfull = timed(
    lambda v, a, b: net.apply(v, a, b, global_motion=True,
                              method=_Net.serving_front)[0],
    variables, x0, x1, ITERS,
)
t_fm = timed(middle_only, variables, x0, x1, ITERS)
print(f"lite 4K front(full) {t_frontfull*1e3:.1f} ms; "
      f"front+middle {t_fm*1e3:.1f} ms "
      f"(middle ~{(t_fm-t_frontfull)*1e3:.1f} ms replicated floor)",
      flush=True)

from atmvfi_tpu.parallel.spatial import spatial_ici_bytes_deep

for n in (2, 4):
    t_shard = timed(build_sim(H4, W4, n), variables, x0, x1, ITERS)
    ici = spatial_ici_bytes(H4, W4, n) / ICI_BYTES_PER_S
    proj = 1.0 / (t_shard + ici)
    print(
        f"n={n} SHALLOW: per-shard {t_shard*1e3:.1f} ms + "
        f"ICI ~{ici*1e3:.1f} ms ({spatial_ici_bytes(H4, W4, n)/1e6:.0f} "
        f"MB @45GB/s) -> projected {proj:.2f} fps "
        f"({proj/ (1/t_full):.2f}x single-chip)",
        flush=True,
    )

for n in (2, 4, 8):
    t_shard = timed(build_sim_deep(H4, W4, n), variables, x0, x1, ITERS)
    ib = spatial_ici_bytes_deep(H4, W4, n, cfg.fused_dim, cfg.global_dim)
    ici = ib / ICI_BYTES_PER_S
    proj = 1.0 / (t_shard + ici)
    print(
        f"n={n} DEEP: per-shard (front slab + middle + tail slab) "
        f"{t_shard*1e3:.1f} ms + ICI ~{ici*1e3:.1f} ms ({ib/1e6:.0f} "
        f"MB @45GB/s) -> projected {proj:.2f} fps "
        f"({proj/ (1/t_full):.2f}x single-chip)",
        flush=True,
    )
