"""Headline benchmark: dual-pol Bayesian wind inversion throughput.

Synthetic Sentinel-1-EW-like dual-pol scene (VV via CMOD5n + VH via
gmf_s1_v2, high-resolution LUTs, ECMWF-like ancillary prior) inverted
with the fused Pallas pipeline (coarse expanded-form MXU argmin +
direct-form VPU slab refine). Matches BASELINE.json config #3.

Prints ONE JSON line. ``vs_baseline`` is measured Mpx/s/chip divided by
the north-star rate implied by BASELINE.json (10^8 px / 5 s / 8 chips
= 2.5 Mpx/s/chip); >1.0 beats the target.

Budget discipline (round-5): the whole run targets ``BENCH_BUDGET_S``
seconds (default 460) measured from process start. The headline is
measured FIRST among the expensive sections; every later section is
skipped when the remaining budget is smaller than its cost estimate
(recorded under ``skipped_sections``), and a SIGTERM/SIGALRM from an
external timeout emits the JSON line with everything measured so far —
a timeout can no longer erase numbers that were already on the clock.
"""

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_RATE = 2.5  # Mpx/s/chip: 1e8 px in 5 s on 8 chips (BASELINE.json)
T_START = time.time()
DEADLINE = T_START + float(os.environ.get("BENCH_BUDGET_S", "460"))

RESULTS = {}
SKIPPED = []
_EMITTED = False


def _remaining():
    return DEADLINE - time.time()


def emit():
    """Print the single JSON result line from whatever has been measured.

    Idempotent: the signal handler and the normal end-of-run path share
    it, and only the first call prints.
    """
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    r = dict(RESULTS)
    mpx_s = r.pop("headline_mpx_s", None)
    backend = r.pop("backend", "unknown")
    parity = r.get("pallas_vs_exact_max_dev_m_s")
    parity_str = (f"pallas==exact max dev {parity:g} m/s, "
                  if parity is not None else "")
    rms = r.get("rms_vs_truth_noisy_m_s")
    rms_str = (f"RMS vs truth on noisy synthetic scene {rms:.3f} m/s "
               "[not a parity metric], " if rms is not None else "")
    e2e = r.get("e2e_from_host_mpx_s")
    e2e_str = f"from-host e2e {e2e:.2f} Mpx/s, " if e2e is not None else ""
    out = {
        "metric": "dual-pol inversion throughput, device-resident inputs "
                  f"({backend}, mode={r.pop('mode', '?')}, {parity_str}"
                  f"{rms_str}{e2e_str}"
                  f"wall {time.time() - T_START:.0f}s)",
        "value": round(mpx_s, 3) if mpx_s is not None else None,
        "unit": "Mpx/s/chip",
        "vs_baseline": (round(mpx_s / BASELINE_RATE, 3)
                        if mpx_s is not None else None),
        **r,
    }
    if SKIPPED:
        out["skipped_sections"] = SKIPPED
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    # external timeout: salvage the record, then die promptly. stderr
    # note so a human reading the driver tail sees what happened.
    print(f"bench: signal {signum} after {time.time() - T_START:.0f}s — "
          "emitting partial record", file=sys.stderr, flush=True)
    SKIPPED.append(f"interrupted_by_signal_{signum}")
    emit()
    os._exit(0)


def section(name, est_cost_s, fn, *, required=False):
    """Run one measurement section under the wall-clock budget.

    Skips (recording why) when the remaining budget is below the cost
    estimate — unless ``required`` (the headline must always run). A
    section failure records the exception instead of killing the run.
    """
    if not required and _remaining() < est_cost_s:
        SKIPPED.append(f"{name} (budget: {_remaining():.0f}s left, "
                       f"needs ~{est_cost_s:.0f}s)")
        print(f"bench: SKIP {name} ({_remaining():.0f}s left)",
              file=sys.stderr, flush=True)
        return None
    t0 = time.time()
    try:
        out = fn()
        print(f"bench: {name} done in {time.time() - t0:.1f}s "
              f"({_remaining():.0f}s left)", file=sys.stderr, flush=True)
        return out
    except Exception as e:  # noqa: BLE001 — one section must not kill the record
        SKIPPED.append(f"{name} ({type(e).__name__}: {e})")
        print(f"bench: FAIL {name}: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None


_drain_fn = None


def drain(out):
    """Force completion of all queued device work feeding ``out``.

    On the axon dev-tunnel plugin, ``jax.block_until_ready`` can return
    before queued executions finish (measured: a 5-rep matmul chain
    "blocked" in 0.3 ms, then a 4-byte readback took the full compute
    time) — so every timing loop here drains through a tiny
    data-dependent device->host readback instead.
    """
    import jax
    import jax.numpy as jnp

    global _drain_fn
    if _drain_fn is None:
        # real projection inside the jit: the axon plugin cannot d2h
        # complex buffers (UNIMPLEMENTED), though complex ops execute
        _drain_fn = jax.jit(
            lambda t: jnp.real(jnp.ravel(t)[:1]).astype(jnp.float32))
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(_drain_fn(leaves[-1]))


def _backend_responsive(timeout_s=60):
    """Probe device-backend init in a subprocess.

    The axon dev tunnel occasionally wedges: ``jax.devices()`` then hangs
    forever (not an exception), which would hang this whole bench. Probing
    in a child process bounds that; on a wedge the bench degrades to the
    CPU path with ``tpu_unavailable: true`` instead of producing nothing.
    Healthy backends (TPU or plain CPU) answer in seconds.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def _synthetic_tile(ny, nx, seed):
    """Shared synthetic streak scene (ONE source: the streaks and
    gradients-class rates must stay comparable — two drifting copies of
    this block would silently decouple them)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:256, 0:256]
    tile = 1.0 + 0.5 * np.sin(0.35 * (x + 0.6 * y))
    return np.abs(np.tile(tile, (ny // 256, nx // 256))
                  + 0.1 * rng.normal(size=(ny, nx))).astype(np.float32) + 0.01


def bench_detrend(on_tpu):
    """sigma0_detrend rate (BASELINE config #1): public API end-to-end,
    numpy in -> numpy out, including both transfers. Runs BEFORE the
    inversion sections so the dev tunnel's sticky transfer collapse
    (docs/DESIGN.md) cannot contaminate it."""
    from xsarsea_tpu import sigma0_detrend

    ny, nx = (4096, 2048) if on_tpu else (512, 256)
    rng = np.random.default_rng(3)
    inc2d = np.tile(np.linspace(18.0, 47.0, nx), (ny, 1))
    s0 = rng.uniform(1e-3, 0.2, (ny, nx))
    sigma0_detrend(s0, inc2d)  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = sigma0_detrend(s0, inc2d)  # numpy out: materialized
        best = max(best, ny * nx / (time.time() - t0) / 1e6)
    assert np.isfinite(out).all()
    return best


def bench_streaks():
    """Wind-streak histogram pipeline rate (BASELINE config #4).

    One jitted streaks_histogram_core pass (R2 -> Scharr local gradients
    -> windowed 72-bin histograms) on an EW-chip-sized tile; reported as
    input megapixels per second, steady state, device-resident.
    """
    import jax
    import jax.numpy as jnp

    from xsarsea_tpu.gradients import streaks_histogram_core

    ny, nx = 4096, 4096
    img = _synthetic_tile(ny, nx, seed=1)

    win = 40  # 160-px windows in lg pixels (factor-4 reduced grid)
    step = win
    n_lg = ny // 4
    centers = np.arange(win // 2, n_lg - win // 2, step, dtype=np.int32)
    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = ((bins[1:] + bins[:-1]) / 2).astype(np.float32)

    from functools import partial

    fn = jax.jit(partial(streaks_histogram_core, window=win))
    img_d = jnp.asarray(img)
    cl = jnp.asarray(centers)
    bins_d = jnp.asarray(bins)
    out = fn(img_d, centers_l=cl, centers_s=cl, angles_bins=bins_d)
    drain(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(img_d, centers_l=cl, centers_s=cl, angles_bins=bins_d)
    drain(out)
    return ny * nx * reps / (time.time() - t0) / 1e6


def bench_gradients_class():
    """Full multiscale Gradients class rate (the user-facing fan-out).

    2 pols x 2 downscale factors x 2 window sizes on a 2048^2-per-pol
    scene, including class construction, windows_at alignment and
    stacking per rep — not just the single-scale fused core. Reported as
    input megapixels (base image x pols) per second, steady state,
    device-resident input (the same convention as the other rates: this
    dev tunnel's h2d path collapses to tens of MB/s and would otherwise
    time the tunnel, not the class).
    """
    import jax.numpy as jnp

    from xsarsea_tpu.dimarray import DimArray
    from xsarsea_tpu.gradients import Gradients

    ny = nx = 2048
    base = _synthetic_tile(ny, nx, seed=2)
    img = np.stack([base, 0.2 * base])
    img_d = jnp.asarray(img)
    drain(img_d)
    da = DimArray(img_d, dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV", "VH"]),
                          "line": np.arange(ny) * 10.0,
                          "sample": np.arange(nx) * 10.0})

    def run():
        g = Gradients(da, windows_sizes=[1600, 3200],
                      downscales_factors=[1, 2])
        h = g.histogram
        drain(h["weight"].data)
        return h

    run()  # compile
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        run()
    return img.size * reps / (time.time() - t0) / 1e6


def _register_synthetic_cmod7():
    """Register a CMOD7 model from a synthesized KNMI binary table.

    The real KNMI file cannot be fetched here (zero egress); the table is
    cmod5n evaluated on CMOD7's native grid (250 wspd x 73 phi x 51 inc,
    reference cmod7.py:31-44), written in the packed Fortran-ordered
    binary format and loaded through the production reader + native codec
    — so the bench exercises the full CMOD7 loader/normalizer path at the
    high-resolution grid (BASELINE config #5).
    """
    import tempfile
    from pathlib import Path

    from xsarsea_tpu.models import available_models, get_model
    from xsarsea_tpu.models.cmod7 import register_cmod7

    if "gmf_cmod7" in available_models().index:
        return
    wspd = np.arange(0.2, 50.0 + 0.2, 0.2)
    phi = np.arange(0.0, 180.0 + 2.5, 2.5)
    inc = np.arange(16.0, 66.0 + 1.0, 1.0)
    vals = np.asarray(get_model("gmf_cmod5n")(inc, wspd, phi).data)
    table = np.ascontiguousarray(vals.transpose(1, 2, 0))  # (wspd, phi, inc)
    flat = np.concatenate([
        np.array([0.0], np.float32),
        table.astype(np.float32).reshape(-1, order="F"),
        np.array([0.0], np.float32)])
    d = Path(tempfile.mkdtemp(prefix="cmod7_bench_")) / "cmod7"
    d.mkdir()
    flat.astype("<f4").tofile(d / "gmf_cmod7_vv.dat_little_endian")
    register_cmod7(str(d))


def _ensure_native_lutio(timeout_s=120):
    """Build the native LUT codec in-place when absent (VERDICT r3 #9:
    the bench environment must exercise the production decoder, not the
    pure-Python fallback). Returns True when the native module imports."""
    import importlib
    import subprocess
    from pathlib import Path

    try:
        importlib.import_module("xsarsea_tpu._lutio")
        return True
    except ImportError:
        pass
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=Path(__file__).parent, capture_output=True,
            timeout=timeout_s, check=True)
        # the package dir may already sit in the FileFinder mtime cache
        # (scanned this very second): without invalidation the fresh .so
        # is invisible and the bench would silently time the fallback
        importlib.invalidate_caches()
        importlib.import_module("xsarsea_tpu._lutio")
        return True
    except Exception:  # noqa: BLE001 — toolchain absent: fallback is used
        return False


def _e2e_child(scene_dir):
    """Fresh-process from-disk e2e measurement (invoked as
    ``bench.py --e2e-child <dir>`` by main()).

    The in-process e2e number is hostage to the dev tunnel's sticky h2d
    collapse: by the time main()'s e2e section runs, the warm-up pass has
    already executed gathers with the ~400 MB LUT operands resident and
    transfers may have degraded ~30x (docs/DESIGN.md). A fresh process is
    the production-shaped scenario — a user starts python and inverts a
    scene from disk — so this child loads the SAME scene (memmapped) and
    times the public streamed path from a clean backend. The jit compile
    is a persistent-cache hit (the parent just compiled the identical
    program).
    """
    import jax
    import jax.numpy as jnp

    from xsarsea_tpu.models import get_model
    from xsarsea_tpu.windspeed.inversion import (_invert_source,
                                                 _LazySource, prepare_tables)

    load = lambda name: np.load(os.path.join(scene_dir, name + ".npy"),
                                mmap_mode="r")
    inc, s0_co, s0_cr, anc = (load(k) for k in
                              ("inc", "s0_co", "s0_cr", "anc"))
    n = inc.shape[0]
    tables = prepare_tables(get_model("gmf_cmod5n"), get_model("gmf_s1_v2"),
                            dtype=jnp.float32)
    mode = "pallas" if jax.default_backend() == "tpu" else "exact"
    src = _LazySource((n,), np.dtype(np.float32), inc, s0_co=s0_co,
                      s0_cr=s0_cr, dsig_cr=0.1, anc=anc)
    best = 0.0
    # pass 1 pays the (persistent-cache) compile load + LUT staging but
    # runs on fresh transfers; pass 2 is compile-free but may hit the
    # collapsed tunnel. max() keeps whichever the backend favours.
    for _ in range(2):
        t0 = time.time()
        co_d, dual_d = _invert_source(tables, src, mode=mode,
                                      device_output=True)
        drain((co_d, dual_d))
        best = max(best, n / (time.time() - t0) / 1e6)
        del co_d, dual_d
    print(json.dumps({"e2e_mpx_s": best}))


def _e2e_fresh_process(scene_dir, timeout_s=240):
    """Measure from-disk e2e in a fresh process on an already-written
    scene dir. Returns the child's Mpx/s or None (child failure /
    timeout never fails the bench)."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--e2e-child",
             scene_dir],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return float(json.loads(line)["e2e_mpx_s"])
            except (ValueError, KeyError):
                continue
    except Exception:  # noqa: BLE001 — diagnostics-only section
        pass
    return None


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    try:
        _main_body()
    except Exception as e:  # noqa: BLE001 — salvage whatever was measured
        SKIPPED.append(f"crashed: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc()
    finally:
        emit()


def _main_body():
    tpu_unavailable = not _backend_responsive()

    import jax

    if tpu_unavailable:
        # before any backend init: fall back to the host CPU platform so
        # the bench still emits its JSON line on a wedged dev tunnel
        jax.config.update("jax_platforms", "cpu")
        RESULTS["tpu_unavailable"] = True

    import jax.numpy as jnp

    RESULTS["native_lutio"] = _ensure_native_lutio()

    from xsarsea_tpu.models import get_model
    from xsarsea_tpu.windspeed.inversion import (_get_invert_fn,
                                                 _invert_source, _LazySource,
                                                 invert_pixels,
                                                 prepare_tables)

    on_tpu = jax.default_backend() == "tpu"
    mode = "pallas" if on_tpu else "exact"
    RESULTS["backend"] = jax.default_backend()
    RESULTS["mode"] = mode

    # config #1 first: fresh-process transfers (see bench_detrend docstring)
    d = section("detrend", 40, lambda: bench_detrend(on_tpu))
    if d is not None:
        RESULTS["detrend_mpx_s"] = round(d, 1)

    n = 1 << 23 if on_tpu else 1 << 16  # 8.4 Mpx (64 Kpx on CPU fallback)
    nxv = 4096  # scene width for the 2-D / vector-incidence shapes
    rng = np.random.default_rng(0)
    inc = rng.uniform(18.0, 47.0, n)
    wspd = rng.uniform(0.5, 45.0, n)
    phi = rng.uniform(0.0, 360.0, n)

    m_co = get_model("gmf_cmod5n")
    m_cr = get_model("gmf_s1_v2")
    tables = prepare_tables(m_co, m_cr, dtype=jnp.float32)

    # forward-model the scene (not timed)
    s0_co_db = 10 * np.log10(
        np.asarray(m_co(inc, wspd, phi, broadcast=True)) + 1e-15)
    s0_cr_db = 10 * np.log10(
        np.asarray(m_cr(inc, wspd, broadcast=True)) + 1e-15)
    anc = (wspd + rng.normal(0, 1.5, n)).clip(0.2) * np.exp(
        1j * np.deg2rad(phi))
    dsig_cr = np.full(n, 0.1)

    # ---- HEADLINE (always runs): steady-state inversion rate with
    # device-resident inputs — the faithful proxy for production
    # hardware, where PCIe/ICI feeds the chip 2-3 orders of magnitude
    # faster than this dev tunnel (whose h2d path degrades ~30x once any
    # gather op has executed; see docs/DESIGN.md and the axon notes)
    reps = 3
    dev = [jnp.asarray(np.ascontiguousarray(a, np.float32)) for a in
           (inc, s0_co_db, s0_cr_db, dsig_cr, anc.real, anc.imag)]
    dev.append(jnp.asarray(0.1, jnp.float32))

    def headline():
        fn = _get_invert_fn(tables, 8192, mode=mode, dsig_co=0.1)
        out = fn(*dev)
        drain(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*dev)
        drain(out)
        RESULTS["headline_mpx_s"] = n * reps / (time.time() - t0) / 1e6
        # RMS vs truth for the metric string (reuses the warm closure; a
        # 1M-px subsample keeps the d2h readback small on the dev tunnel)
        ns = min(n, 1 << 20)
        co, dual = invert_pixels(tables, inc[:ns], s0_co_db[:ns],
                                 s0_cr_db[:ns], dsig_cr[:ns], anc[:ns],
                                 mode=mode)
        RESULTS["rms_vs_truth_noisy_m_s"] = round(float(
            np.sqrt(np.nanmean((np.abs(dual) - wspd[:ns]) ** 2))), 3)

    section("headline", 0, headline, required=True)

    # ---- CMOD7 high-res-LUT variant (BASELINE config #5): same grid
    # shapes, so the pipeline executable is reused with the CMOD7 table
    # operands
    def cmod7():
        _register_synthetic_cmod7()
        tables7 = prepare_tables(get_model("gmf_cmod7"), m_cr,
                                 dtype=jnp.float32,
                                 inc_step=0.1, wspd_step=0.1, phi_step=1.0)
        fn7 = _get_invert_fn(tables7, 8192, mode=mode, dsig_co=0.1)
        out = fn7(*dev)
        drain(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn7(*dev)
        drain(out)
        RESULTS["cmod7_mpx_s"] = round(n * reps / (time.time() - t0) / 1e6, 3)
        # drop the extra closure (it pins a duplicate set of padded LUT
        # operands on device) before the remaining sections
        tables7.__dict__.pop("_invert_fn_cache", None)

    if on_tpu:
        section("cmod7", 45, cmod7)

    # ---- copol-only VV inversion (BASELINE config #2): no crosspol
    # table, so the pipeline compiles without stage 3; the call signature
    # is unchanged (crosspol operands are never-read dummies)
    def copol():
        tables_co = prepare_tables(m_co, None, dtype=jnp.float32)
        fn_co = _get_invert_fn(tables_co, 8192, mode=mode, dsig_co=0.1)
        out = fn_co(*dev)
        drain(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn_co(*dev)
        drain(out)
        RESULTS["copol_mpx_s"] = round(n * reps / (time.time() - t0) / 1e6, 3)
        tables_co.__dict__.pop("_invert_fn_cache", None)

    if on_tpu:
        section("copol", 45, copol)

    # ---- parity chain ON THIS DEVICE: fused pallas pipeline vs the
    # portable exact XLA path on a 64k-px subsample (expected:
    # identical). Ordered BEFORE the e2e/tunnel sections: on a
    # cold-cache driver run the budget can run short, and the parity /
    # streaks / gradients numbers carry more information than the
    # tunnel-bound transfer rates (round-5 reorder).
    def parity():
        ns = 1 << 16  # the exact path per-pixel-gathers ~360 KB of LUT
        sub = tuple(a[:ns] for a in (inc, s0_co_db, s0_cr_db, dsig_cr, anc))
        co_p, dual_p = invert_pixels(tables, *sub, mode="pallas")
        co_x, dual_x = invert_pixels(tables, *sub, mode="exact")
        diffs = [np.nanmax(np.abs(np.nan_to_num(np.abs(a) - np.abs(b))))
                 for a, b in ((co_p, co_x), (dual_p, dual_x))]
        RESULTS["pallas_vs_exact_max_dev_m_s"] = float(max(diffs))

    if on_tpu:
        section("parity", 70, parity)

    # ---- streaks + multiscale gradients (BASELINE config #4)
    s = section("streaks", 45, bench_streaks)
    if s is not None:
        RESULTS["streaks_mpx_s"] = round(s, 1)
    g = section("gradients_class", 80, bench_gradients_class)
    if g is not None:
        RESULTS["gradients_class_mpx_s"] = round(g, 1)

    # ---- end-to-end from host memory: the public streamed path with the
    # production wire format — LINEAR f32 sigma0 (dB conversion fused
    # into the device pipeline), scalar dsig_cr not streamed, vector
    # incidence (SAR incidence varies along range only: ships O(nx), not
    # O(n)) — 16 B/px. Device-resident outputs (downstream stages keep
    # working on device).
    s0_co_lin32 = np.power(10.0, s0_co_db / 10.0).astype(np.float32)
    s0_cr_lin32 = np.power(10.0, s0_cr_db / 10.0).astype(np.float32)
    # cap the e2e sections at 4 Mpx: they measure a steady-state
    # *transfer-bound* rate (the dev tunnel runs at ~0.5-1 Mpx/s once
    # collapsed), so half the scene costs half the budget at identical
    # information — with the full 8.4 Mpx one of the two sections
    # regularly missed the budget
    n_e2e = min(n, 1 << 22)
    nyv = n_e2e // nxv if n_e2e >= nxv else 1
    npv = nyv * (nxv if n_e2e >= nxv else n_e2e)
    nxv_eff = nxv if n_e2e >= nxv else n_e2e
    inc_vec = np.linspace(18.0, 47.0, nxv_eff).astype(np.float32)

    def e2e_host():
        src = _LazySource(
            (nyv, nxv_eff), np.dtype(np.float32), inc_vec,
            s0_co=s0_co_lin32[:npv].reshape(nyv, nxv_eff),
            s0_cr=s0_cr_lin32[:npv].reshape(nyv, nxv_eff),
            dsig_cr=0.1, anc=anc[:npv].reshape(nyv, nxv_eff))
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            co_d, dual_d = _invert_source(tables, src, mode=mode,
                                          device_output=True)
            drain((co_d, dual_d))
            best = max(best, npv / (time.time() - t0) / 1e6)
            del co_d, dual_d
        RESULTS["e2e_from_host_mpx_s"] = round(best, 2)

    section("e2e_from_host", 40, e2e_host)

    # ---- end-to-end from DISK through the public API (VERDICT r4 #6):
    # invert_from_model on memmapped npy inputs, host outputs — the full
    # user-shaped path including piece streaming, device compute and the
    # d2h result copy. Scene dir is shared with the fresh-process child.
    import shutil
    import tempfile

    scene_dir = tempfile.mkdtemp(prefix="bench_e2e_")
    np.save(os.path.join(scene_dir, "inc.npy"), inc)
    np.save(os.path.join(scene_dir, "s0_co.npy"), s0_co_lin32)
    np.save(os.path.join(scene_dir, "s0_cr.npy"), s0_cr_lin32)
    np.save(os.path.join(scene_dir, "anc.npy"), anc)

    def e2e_disk():
        from xsarsea_tpu.windspeed import invert_from_model

        mm = lambda k: np.load(os.path.join(scene_dir, k + ".npy"),
                               mmap_mode="r")[:npv].reshape(nyv, nxv_eff)
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            co, dual = invert_from_model(
                mm("inc"), mm("s0_co"), mm("s0_cr"),
                ancillary_wind=mm("anc"), dsig_cr=0.1,
                model=("gmf_cmod5n", "gmf_s1_v2"), mode=mode)
            best = max(best, npv / (time.time() - t0) / 1e6)
            del co, dual
        RESULTS["e2e_disk_mpx_s"] = round(best, 2)

    section("e2e_disk", 45, e2e_disk)

    # ---- host prep rate of the streamed public-API path (piece slicing,
    # complex split, f32 cast; the dB conversion runs fused on device)
    def host_prep():
        src = _LazySource((n,), np.dtype(np.float32), inc,
                          s0_co=s0_co_lin32, s0_cr=s0_cr_lin32,
                          dsig_cr=0.1, anc=anc, device_db=True)
        t0 = time.time()
        for lo in range(0, n, 1 << 22):
            src.piece(lo, min(lo + (1 << 22), n))
        RESULTS["host_prep_mpx_s"] = round(n / (time.time() - t0) / 1e6, 1)

    section("host_prep", 10, host_prep)

    # ---- fresh-process from-disk e2e: the honest production-shaped
    # number, free of this process's sticky tunnel-transfer state. OFF by
    # default (VERDICT r4 #1b): the child spends ~3 min staging the LUT
    # operands over the dev tunnel — measured 1.7-2.1 Mpx/s, within the
    # in-process from-disk number's range, so it is not worth its budget
    # in the driver run. Set BENCH_E2E_FRESH=1 to measure it.
    def e2e_fresh():
        budget = min(240, max(60, int(_remaining())))
        r = _e2e_fresh_process(scene_dir, timeout_s=budget)
        if r is None:
            raise RuntimeError("child produced no result")
        RESULTS["e2e_from_host_fresh_mpx_s"] = round(r, 2)
        RESULTS["e2e_from_host_mpx_s"] = round(
            max(r, RESULTS.get("e2e_from_host_mpx_s", 0.0)), 2)

    if on_tpu and os.environ.get("BENCH_E2E_FRESH"):
        section("e2e_fresh", 190, e2e_fresh)

    shutil.rmtree(scene_dir, ignore_errors=True)
    emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--e2e-child":
        _e2e_child(sys.argv[2])
    else:
        main()
