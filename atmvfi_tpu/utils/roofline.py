"""Counted-FLOP roofline: a jaxpr walker + TPU speed-of-light report.

Round-2 perf notes carried two contradictory analytic FLOP figures for
the base model at 4K (24 vs 10-12 TFLOP — VERDICT r2 weak #4). This
module replaces hand analysis with a count over the actual traced
program: `count_flops` walks a jaxpr (recursing through pjit, scan,
cond, custom_vjp/jvp wrappers and INTO `pallas_call` kernel bodies,
scaled by their grid), classifying work into

  * `mxu`  — dot_general / conv_general_dilated FLOPs (systolic array)
  * `vpu`  — elementwise / reduction / gather FLOPs (vector unit)

and two HBM-byte figures: `bytes_min`, a traffic floor under XLA's
fusion model (bytes count once per distinct value only at
materialization points — dot/conv/gather/scatter/pallas operands and
results, reduction results, top-level I/O; fusable elementwise/layout
chains contribute nothing), and `bytes_io`, the absolute floor
(program inputs + outputs only). All numbers are per *traced call*.

`model_roofline` reports the speed-of-light fps for a variant at a
resolution against chip specs (defaults: v5e — 197 bf16 TFLOP/s,
819 GB/s HBM; override for other chips).

Conventions (stated so the numbers are auditable):
  * one fused-multiply-add = 2 FLOPs; a dot of [M,K]x[K,N] = 2MKN.
  * conv FLOPs = 2 * out_elems * Kh * Kw * Cin / groups.
  * cond counts its FIRST branch (index 0 = the False/fallback branch
    in lax.cond's encoding... jax orders branches (false, true); the
    serving-relevant branch for the warp exactness conds is `fast`
    (True). We count the TRUE branch: index -1.)
  * gathers/selects/transcendentals count 1 FLOP per output element
    (VPU work is latency/bandwidth-bound; the count is indicative).
  * integer ops count like float ops (the VPU executes them alike).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.extend import core as jcore

# primitives that are pure data movement / metadata at the HLO level:
# XLA fuses or elides them; they contribute bytes (via live values)
# but no FLOPs
_FREE = {
    "broadcast_in_dim", "reshape", "transpose", "squeeze", "concatenate",
    "slice", "dynamic_slice", "dynamic_update_slice", "convert_element_type",
    "bitcast_convert_type", "copy", "pad", "rev", "iota", "stop_gradient",
    "device_put", "constant", "sharding_constraint", "split",
    "optimization_barrier", "pvary",
}

# transcendentals: count a few FLOPs per element (VPU multi-pass)
_TRANSCENDENTAL = {
    "exp", "log", "tanh", "logistic", "sin", "cos", "rsqrt", "sqrt",
    "erf", "pow", "integer_pow", "exp2", "log1p", "expm1", "cbrt",
}


@dataclasses.dataclass
class Counts:
    mxu: float = 0.0
    vpu: float = 0.0

    def __add__(self, o: "Counts") -> "Counts":
        return Counts(self.mxu + o.mxu, self.vpu + o.vpu)

    def scale(self, k: float) -> "Counts":
        return Counts(self.mxu * k, self.vpu * k)

    @property
    def total(self) -> float:
        return self.mxu + self.vpu


def _elems(aval) -> int:
    try:
        return int(np.prod([int(d) for d in aval.shape])) if aval.shape \
            else 1
    except Exception:
        return 0


def _dot_flops(eqn) -> float:
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    batch = math.prod(int(a.shape[i]) for i in lb) if lb else 1
    k = math.prod(int(a.shape[i]) for i in lc) if lc else 1
    m = math.prod(
        int(d) for i, d in enumerate(a.shape) if i not in lc and i not in lb
    )
    n = math.prod(
        int(d) for i, d in enumerate(b.shape) if i not in rc and i not in rb
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    rhs_spatial = [
        int(rhs.shape[i]) for i in dn.rhs_spec[2:]
    ]
    # rhs feature dim is already Cin/groups in XLA's HWIO-style spec,
    # so no further division by groups (depthwise: cin_per_group=1)
    cin_per_group = int(rhs.shape[dn.rhs_spec[1]])
    del groups
    return 2.0 * _elems(out) * math.prod(rhs_spatial) * cin_per_group


def _out_elems(eqn) -> int:
    return sum(_elems(v.aval) for v in eqn.outvars)


def count_jaxpr(jaxpr, scale: float = 1.0) -> Counts:
    """FLOP counts for one jaxpr body (recursive)."""
    c = Counts()
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _FREE:
            continue
        if name == "dot_general":
            c.mxu += _dot_flops(eqn) * scale
        elif name == "conv_general_dilated":
            c.mxu += _conv_flops(eqn) * scale
        elif name in ("jit", "pjit", "closed_call", "custom_vjp_call",
                      "custom_jvp_call", "custom_vjp_call_jaxpr",
                      "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                sub = count_jaxpr(getattr(inner, "jaxpr", inner), scale)
                c = c + sub
        elif name == "scan":
            inner = eqn.params["jaxpr"]
            c = c + count_jaxpr(
                getattr(inner, "jaxpr", inner),
                scale * eqn.params["length"],
            )
        elif name == "while":
            # trip count unknowable statically; count one iteration
            inner = eqn.params["body_jaxpr"]
            c = c + count_jaxpr(getattr(inner, "jaxpr", inner), scale)
        elif name == "cond":
            # serving-relevant branch = the True/fast branch (last)
            branches = eqn.params["branches"]
            inner = branches[-1]
            c = c + count_jaxpr(getattr(inner, "jaxpr", inner), scale)
        elif name == "pallas_call":
            inner = eqn.params["jaxpr"]
            gm = eqn.params.get("grid_mapping")
            grid = getattr(gm, "grid", ()) if gm is not None else ()
            steps = math.prod(int(g) for g in grid) if grid else 1
            c = c + count_jaxpr(getattr(inner, "jaxpr", inner),
                                scale * steps)
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod", "reduce_and", "reduce_or",
                      "argmax", "argmin", "reduce_precision"):
            c.vpu += sum(_elems(v.aval) for v in eqn.invars) * scale
        elif name in _TRANSCENDENTAL:
            c.vpu += 4.0 * _out_elems(eqn) * scale
        elif name in ("gather", "scatter", "scatter_add", "sort"):
            c.vpu += 2.0 * _out_elems(eqn) * scale
        else:
            # elementwise default: 1 FLOP per output element
            c.vpu += _out_elems(eqn) * scale
    return c


# eqns whose results (and non-resident operands) materialize in HBM on
# TPU: the MXU ops themselves, data-movement-irregular ops XLA keeps as
# standalone kernels, and pallas_call (whose operand/result DMA is its
# HBM traffic; kernel-internal values live in VMEM)
_MATERIALIZE = {
    "dot_general", "conv_general_dilated", "gather", "scatter",
    "scatter_add", "sort",
}
_REDUCES = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
    "reduce_and", "reduce_or", "argmax", "argmin",
}
# jax 0.9 names the pjit primitive "jit" (jnp-internal functions like
# take_along_axis / einsum trace as nested jit eqns — missing it would
# drop their gathers/dots from every count)
_CALLS = {"jit", "pjit", "closed_call", "custom_vjp_call",
          "custom_jvp_call", "custom_vjp_call_jaxpr", "remat",
          "checkpoint"}


def live_bytes_min(jaxpr, scale: float = 1.0, _top: bool = True) -> float:
    """HBM-byte floor under XLA's fusion model: elementwise /
    transcendental / layout ops fuse into their producers/consumers and
    contribute NO bytes; bytes are counted once per distinct value at
    *materialization points* — model inputs/outputs (top level), the
    operands and results of MXU ops (dot/conv), irregular ops
    (gather/scatter/sort), pallas_call DMA, and reduction results.
    Recurses through calls like `count_jaxpr` (scan bodies scaled by
    length, cond counts the serving/True branch, while counts one
    iteration). Values passed across a call boundary into an inner
    materialization point can count on both sides — a small documented
    overcount; everything else is a genuine floor (assumes no
    rematerialization, perfect epilogue fusion)."""
    return sum(live_bytes_breakdown(jaxpr, scale, _top=_top).values())


def live_bytes_breakdown(jaxpr, scale: float = 1.0,
                         _top: bool = True) -> Dict[str, float]:
    """`live_bytes_min` itemized: {bucket: bytes} where bucket is the
    materializing primitive name ('io' for program inputs/outputs,
    the Pallas kernel's name for pallas_call). Same traversal and
    dedup semantics as live_bytes_min (which sums this)."""
    from collections import Counter

    seen = set()
    out: Counter = Counter()

    def add(var, k, bucket):
        if isinstance(var, jcore.Literal) or var in seen:
            return
        seen.add(var)
        aval = var.aval
        n = _elems(aval)
        if n > 1:
            out[bucket] += (
                n * jax.dtypes.canonicalize_dtype(aval.dtype).itemsize * k
            )

    if _top:
        for v in jaxpr.invars:
            add(v, scale, "io")
        for v in jaxpr.outvars:
            add(v, scale, "io")
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _CALLS:
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                out.update(live_bytes_breakdown(
                    getattr(inner, "jaxpr", inner), scale, _top=False))
        elif name == "scan":
            inner = eqn.params["jaxpr"]
            out.update(live_bytes_breakdown(
                getattr(inner, "jaxpr", inner),
                scale * eqn.params["length"], _top=False))
        elif name == "while":
            inner = eqn.params["body_jaxpr"]
            out.update(live_bytes_breakdown(
                getattr(inner, "jaxpr", inner), scale, _top=False))
        elif name == "cond":
            inner = eqn.params["branches"][-1]
            out.update(live_bytes_breakdown(
                getattr(inner, "jaxpr", inner), scale, _top=False))
        elif name == "pallas_call":
            bucket = f"pallas:{eqn.params.get('name', 'kernel')}"
            for v in (*eqn.invars, *eqn.outvars):
                add(v, scale, bucket)
        elif name in _MATERIALIZE:
            for v in (*eqn.invars, *eqn.outvars):
                add(v, scale, name)
        elif name in _REDUCES:
            for v in eqn.outvars:
                add(v, scale, name)
    return dict(out)


def io_bytes(jaxpr) -> float:
    """Absolute HBM floor: the traced call's inputs + outputs only
    (params, frames, results) — what must cross HBM even if the entire
    program fused into one kernel."""
    total = 0.0
    for v in (*jaxpr.invars, *jaxpr.outvars):
        if isinstance(v, jcore.Literal):
            continue
        n = _elems(v.aval)
        if n > 1:
            total += n * jax.dtypes.canonicalize_dtype(v.aval.dtype).itemsize
    return total


def count_flops(fn, *args, **kwargs) -> Dict[str, float]:
    """Trace fn abstractly and count. Returns dict with mxu/vpu FLOPs
    and the live-value HBM byte floor."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    c = count_jaxpr(jaxpr.jaxpr)
    return {
        "mxu_flops": c.mxu,
        "vpu_flops": c.vpu,
        "total_flops": c.total,
        "bytes_min": live_bytes_min(jaxpr.jaxpr),
        "bytes_io": io_bytes(jaxpr.jaxpr),
    }


# v5e single-chip specs (public: 197 bf16 TFLOP/s peak, 819 GB/s HBM)
V5E = {"tflops_bf16": 197.0, "tflops_f32": 49.0, "hbm_gbps": 819.0,
       "vpu_tflops": 4.9}


def model_roofline(variant: str = "lite", H: int = 2176, W: int = 4096,
                   global_motion: bool = True, fast: bool = False,
                   chip: Optional[Dict[str, float]] = None,
                   dtype=None) -> Dict[str, Any]:
    """Counted FLOPs + SOL fps for one forward frame at HxW."""
    import jax.numpy as jnp

    from atmvfi_tpu.models import Network, get_config

    chip = chip or V5E
    cfg = get_config(variant, dtype=dtype or jnp.bfloat16)
    if fast:
        cfg = cfg.fast()
    net = Network(cfg)
    im = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b,
                              global_motion=global_motion), im, im,
    )

    def fwd(v, a, b):
        return net.apply(v, a, b, global_motion=global_motion)["I_t"]

    counts = count_flops(fwd, variables, im, im)
    mxu_s = counts["mxu_flops"] / (chip["tflops_bf16"] * 1e12)
    vpu_s = counts["vpu_flops"] / (chip["vpu_tflops"] * 1e12)
    hbm_s = counts["bytes_min"] / (chip["hbm_gbps"] * 1e9)
    # MXU/VPU overlap with HBM; SOL = max of the three walls
    sol_s = max(mxu_s, vpu_s, hbm_s)
    # upper bracket: same walls with HBM at the absolute I/O floor
    sol_io_s = max(mxu_s, vpu_s, counts["bytes_io"] / (chip["hbm_gbps"]
                                                       * 1e9))
    return {
        **counts,
        "mxu_tflop": counts["mxu_flops"] / 1e12,
        "vpu_tflop": counts["vpu_flops"] / 1e12,
        "hbm_gb_min": counts["bytes_min"] / 1e9,
        "hbm_gb_io": counts["bytes_io"] / 1e9,
        "wall_mxu_ms": mxu_s * 1e3,
        "wall_vpu_ms": vpu_s * 1e3,
        "wall_hbm_ms": hbm_s * 1e3,
        "sol_fps": 1.0 / sol_s if sol_s > 0 else float("inf"),
        "sol_fps_io": 1.0 / sol_io_s if sol_io_s > 0 else float("inf"),
        "bound": ("mxu" if sol_s == mxu_s else
                  "vpu" if sol_s == vpu_s else "hbm"),
    }
