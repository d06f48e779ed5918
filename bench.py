"""Benchmark: 2x-interpolation throughput on one TPU chip.

Measures steady-state frames/sec of the base model (global motion on,
bf16 compute) at 4K (3840x2160 padded to /64 per the demo protocol,
demo_2x.py:74) plus 1080p / lite / Vimeo-res context configs. The
headline metric is base-4K fps; the reference's own claim is "24 fps
2x on GPU" at Vimeo res (/root/reference/README.md:59).

Engineered to the driver's wall-clock budget (round-3 VERDICT item 1):

  * the persistent JAX compilation cache is enabled up front, so a
    primed run (builder runs `python bench.py` once before round end)
    is compile-cache-hits only;
  * the HEADLINE config (base 4K) runs FIRST and its JSON line prints
    immediately — every later config re-prints an updated line, and
    the driver takes the last parsed line, so a timeout kill after the
    first measurement still lands a number;
  * a wall-clock budget (env BENCH_BUDGET_S, default 1200 s) skips
    remaining configs once exceeded and prints what was measured.

Prints JSON lines: {"metric", "value", "unit", "vs_baseline", "extra"}.
Context lines go to stderr; the LAST stdout line is the result.
"""
import json
import os
import sys
import threading
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def over_budget(label):
    used = time.time() - T_START
    if used > BUDGET_S:
        log(f"bench: budget {BUDGET_S:.0f}s exceeded ({used:.0f}s used) "
            f"— skipping {label} and finishing with what was measured")
        return True
    return False


def enable_compile_cache():
    """Persistent compilation cache (same recipe as __graft_entry__.py):
    a primed cache turns the multi-minute single-core XLA compiles into
    sub-second loads on repeat runs. Never a requirement."""
    import jax

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        log(f"bench: compile cache unavailable ({e!r}); continuing")


def _arm_init_watchdog(seconds=900):
    """Fail fast if the TPU backend never initializes. When the axon
    relay is down, the device claim HANGS forever inside native code
    (SIGTERM is ignored there — observed 2026-08-18, PERF_NOTES
    'Hardware validation queue'); without this the driver's bench run
    would hang instead of reporting. Disarmed once devices resolve."""
    armed = threading.Event()

    def watch():
        if not armed.wait(seconds):
            log(f"bench: TPU backend init did not complete in "
                f"{seconds}s — relay down? aborting")
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return armed


def _frame_pairs(seed, iters, h, w):
    """[iters, 2, 1, h, w, 3] distinct frame pairs: frame 1 is frame 0
    shifted by ~8 px plus fresh noise, so predicted flows are nonzero
    and the tile-slab warp kernel does representative (not best-case
    zero-motion) work — identical-frame input was flagged by review.
    Generated ON DEVICE: host->device uploads crawl at ~1-2 MB/s
    through the axon relay (a 4K pair set would take ~10 minutes)."""
    import jax
    import jax.numpy as jnp

    def gen(k1, k2):
        x0 = jax.random.uniform(k1, (iters, 1, h, w, 3), jnp.float32)
        x1 = jnp.roll(x0, shift=(8, -8), axis=(2, 3))
        x1 = 0.7 * x1 + 0.3 * jax.random.uniform(
            k2, (iters, 1, h, w, 3), jnp.float32
        )
        return jnp.stack([x0, x1], axis=1)

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return jax.jit(gen)(k1, k2)


def build(variant):
    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.models import Network, get_config

    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(rng, a, b, global_motion=True)
    )(dummy, dummy)
    jax.block_until_ready(variables)
    return variables, net


def bench_vimeo_res(variant, iters=20):
    """448x256 (Vimeo90K protocol res, global_motion=False) fps — the
    reference's own benchmark shape; its README claims 24->48 fps 2x
    on GPU (README.md:59)."""
    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.models import Network, get_config

    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=False)
    )(dummy, dummy)
    jax.block_until_ready(variables)
    stacked = _frame_pairs(0, iters, 256, 448)
    # at this size the ~30 ms relay fence dominates a per-call loop, so
    # run the iters as ONE lax.scan (body compiled once, iterations
    # serialized by the carried token) and fence a single scalar
    def chained(variables, stacked):
        def body(tok, pair):
            x0 = pair[0] + tok  # data dependency: forces sequential execution
            y = net.apply(variables, x0, pair[1], global_motion=False)["I_t"]
            return y[:, :1, :1, :1] * 0.0, y.mean()
        _, means = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), stacked)
        return means.sum()

    cf = jax.jit(chained)
    float(cf(variables, stacked))
    t0 = time.time()
    float(cf(variables, stacked))
    return iters / (time.time() - t0)


def bench_resolution(variables, net, h, w, iters):
    """Steady-state fps: iters distinct frames through one lax.scan.

    The scan body (one full forward) compiles once; a carried token
    serializes the iterations on-device, and timing fences a single
    scalar readback at the end. This measures device throughput without
    paying the ~30 ms relay round-trip once per frame (readback is the
    only reliable fence through the relay — block_until_ready can
    return early), while distinct inputs defeat any request dedup.
    """
    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.infer.padder import InputPadder

    padder = InputPadder((1, h, w, 3), divisor=64)
    ph, pw = padder.padded_shape
    return bench_fn(
        lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"],
        variables, ph, pw, iters, seed=h,
    )


def bench_fn(f, variables, ph, pw, iters, seed=0):
    """Steady-state fps of an arbitrary f(variables, im0, im1) at the
    ALREADY-PADDED resolution (ph, pw), fenced scan chain as above."""
    import jax
    import jax.numpy as jnp

    stacked = _frame_pairs(seed, iters, ph, pw)

    def chained(variables, stacked):
        def body(tok, pair):
            x0 = pair[0] + tok  # data dependency: forces sequential execution
            y = f(variables, x0, pair[1])
            return y[:, :1, :1, :1] * 0.0, y.mean()

        _, means = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), stacked)
        return means.sum()

    cf = jax.jit(chained)
    t0 = time.time()
    float(cf(variables, stacked))
    log(f"  first call (compile+run) {ph}x{pw}: {time.time()-t0:.1f}s")
    t0 = time.time()
    float(cf(variables, stacked))
    dt = (time.time() - t0) / iters
    return 1.0 / dt


def emit(fps_4k, extra):
    """Print the result line. Called after EVERY measurement so a
    timeout kill mid-run still leaves a parseable last line."""
    result = {
        "metric": "fps_4k_2x_base_bf16",
        "value": round(fps_4k, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_4k / 30.0, 3),
        "extra": dict(extra),
    }
    print(json.dumps(result), flush=True)


def main():
    enable_compile_cache()
    import jax

    armed = _arm_init_watchdog()
    dev = jax.devices()[0]
    armed.set()  # backend is up; disarm
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
        f"(budget {BUDGET_S:.0f}s)")

    extra = {}

    # --- headline FIRST: base 4K ---
    variables, bnet = build("base")
    fps_4k = bench_resolution(variables, bnet, 2160, 3840, 4)
    log(f"base 4K 2x interp: {fps_4k:.2f} fps/chip "
        f"[{time.time()-T_START:.0f}s elapsed]")
    emit(fps_4k, extra)  # number on the record before anything else

    # counted-FLOP speed-of-light (jaxpr trace, no device compile) so
    # every BENCH records fps alongside %-of-roofline (VERDICT r2 item 5)
    try:
        from atmvfi_tpu.utils.roofline import model_roofline

        # the bench pads 2160 -> 2176 rows (divisor 64)
        rb = model_roofline("base", H=2176, W=3840)
        rl = model_roofline("lite", H=2176, W=3840)
        extra.update({
            "base_4k_sol_fps": round(rb["sol_fps"], 2),
            "base_4k_pct_of_sol": round(100 * fps_4k / rb["sol_fps"], 1),
            "base_4k_bound": rb["bound"],
            "lite_4k_sol_fps": round(rl["sol_fps"], 2),
            "lite_4k_bound": rl["bound"],
        })
        log(f"roofline: base 4K SOL {rb['sol_fps']:.1f} fps ({rb['bound']}"
            f"-bound), lite 4K SOL {rl['sol_fps']:.1f} fps ({rl['bound']})")
        emit(fps_4k, extra)
    except Exception as e:  # roofline must never sink the bench number
        log(f"roofline computation skipped: {e!r}")

    # --- context configs, cheapest-information-per-second first; each
    # one re-prints the line, and each is budget-gated ---
    if not over_budget("base 1080p"):
        fps_1080 = bench_resolution(variables, bnet, 1080, 1920, 8)
        log(f"base 1080p 2x interp: {fps_1080:.2f} fps/chip")
        extra["base_fps_1080p"] = round(fps_1080, 3)
        emit(fps_4k, extra)

    lvars = lnet = None
    if not over_budget("lite"):
        lvars, lnet = build("lite")
        lite_4k = bench_resolution(lvars, lnet, 2160, 3840, 4)
        extra["lite_fps_4k"] = round(lite_4k, 3)
        if "lite_4k_sol_fps" in extra:
            extra["lite_4k_pct_of_sol"] = round(
                100 * lite_4k / extra["lite_4k_sol_fps"], 1
            )
        log(f"lite 4K {lite_4k:.2f} fps")
        emit(fps_4k, extra)

    if lvars is not None and not over_budget("lite 1080p"):
        lite_1080 = bench_resolution(lvars, lnet, 1080, 1920, 8)
        extra["lite_fps_1080p"] = round(lite_1080, 3)
        log(f"lite 1080p {lite_1080:.2f} fps")
        emit(fps_4k, extra)

    if lvars is not None and not over_budget("spatial projection"):
        # multi-chip throughput story on the official record (round-5
        # VERDICT item 3). Two schedules (parallel/spatial.py):
        #   * 'data' (video streams): per-chip full kernel stack, zero
        #     collectives (equality-tested) -> fps/chip == the measured
        #     single-chip number; aggregate = n * dp_fps_per_chip.
        #   * 'spatial' (single-stream latency, deep cut): per-shard
        #     time measured HERE on this chip via the one-shard
        #     simulation (make_deep_shard_sim: front slab + replicated
        #     attention middle + tail slab), plus an analytic ICI term
        #     (spatial_ici_bytes_deep at an assumed 45 GB/s effective
        #     all-gather bandwidth, v5e ring). Derivation: PERF_NOTES
        #     round 5.
        import jax.numpy as _jnp

        from atmvfi_tpu.models import get_config as _gc
        from atmvfi_tpu.parallel.spatial import (
            make_deep_shard_sim, spatial_ici_bytes_deep,
        )

        extra["dp_fps_per_chip_4k_lite"] = extra.get("lite_fps_4k")
        extra["spatial_ici_assumed_gbps"] = 45
        _cfg = _gc("lite")
        for n in (2, 4, 8):
            try:
                sim = make_deep_shard_sim(lnet, 2176, 3840, n)
                t_shard = 1.0 / bench_fn(sim, lvars, 2176, 3840, 4)
                ici = spatial_ici_bytes_deep(
                    2176, 3840, n, _cfg.fused_dim, _cfg.global_dim
                ) / 45e9
                extra[f"spatial_projected_fps_{n}"] = round(
                    1.0 / (t_shard + ici), 3
                )
                log(f"spatial deep n={n}: per-shard {t_shard*1e3:.1f} ms"
                    f" + ICI {ici*1e3:.1f} ms -> projected "
                    f"{extra[f'spatial_projected_fps_{n}']} fps")
                emit(fps_4k, extra)
            except Exception as e:
                log(f"spatial projection n={n} skipped: {e!r}")
            if over_budget(f"spatial projection n={n}"):
                break

    if lvars is not None and not over_budget("lite fast 4K"):
        # fast serving profile (unchecked slab warps + composed full-res
        # warps; same params — deviation documented in PERF_NOTES.md)
        from atmvfi_tpu.models import Network as _Net, get_config as _gc
        import jax.numpy as _jnp

        fnet = _Net(_gc("lite", dtype=_jnp.bfloat16).fast())
        lite_fast_4k = bench_resolution(lvars, fnet, 2160, 3840, 4)
        extra["lite_fast_fps_4k"] = round(lite_fast_4k, 3)
        log(f"lite FAST 4K {lite_fast_4k:.2f} fps")
        emit(fps_4k, extra)

    if not over_budget("vimeo res"):
        vimeo_fps = bench_vimeo_res("base")
        extra["base_fps_448x256_vimeo_res"] = round(vimeo_fps, 3)
        log(f"base 448x256 (Vimeo protocol res): {vimeo_fps:.1f} fps "
            f"(reference demo claim: 24 fps 2x on GPU)")
        emit(fps_4k, extra)

    log(f"bench done in {time.time()-T_START:.0f}s")


if __name__ == "__main__":
    main()
