"""TPU-side correctness gate sweep over every production kernel variant.

The 170-test suite runs Pallas in interpret mode on CPU, which cannot
catch Mosaic lowering bugs (models/fused.py:22-25 documents real ULP
divergence between interpret and lowered code).  Until round 4 only the
headline variant (fused/baked/cull16) had a TPU-verified RMSE gate
(golden/GATE_RESULT.json).  This orchestrator closes that hole: it runs
an on-device gate for every production variant and writes one pass row
per variant to golden/GATE_SWEEP.json.

Two gate classes:

* **Same-stream rows** — engine under test vs the megakernel oracle,
  BOTH on TPU at the same spp.  Every engine shares the
  per-(pixel, sample, bounce) RNG contract, so the two images differ
  only by float summation order and lowering — Monte-Carlo noise
  cancels exactly and the gate can be tight (default 3e-4) at cheap
  spp.  This is the Mosaic-lowering detector.
* **Golden rows** — full BASELINE spec (400x225 @ 1000 spp) vs the
  committed CPU golden artifact (gate 1e-3), for variants that change
  the sample stream itself (russian roulette, stratified AA) and for
  the headline + new engines at full spec.

Each row re-execs validate.py in a fresh subprocess (fresh JAX client:
a wedged tunnel or device fault poisons one row, not the sweep) with a
timeout; failures are recorded as rows with ok=false rather than
aborting.

Usage:
  python exp/gate_sweep.py              # all rows (golden rows skipped
                                        # if the artifact is absent)
  python exp/gate_sweep.py --only dynculled,recluster2
  python exp/gate_sweep.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "golden", "GATE_SWEEP.json")
GOLDEN = os.path.join(ROOT, "golden", "oracle_book_400x225_1000spp.npz")
TPU_ORACLE = os.path.join(ROOT, "golden", "oracle_tpu_same_stream.npz")

# Same-stream rows: (name, extra validate.py args).  All run
# book_one_final 400x224@64 fused-vs-megakernel on TPU (height 224 =
# 28 sublanes x 8, the tile-aligned size nearest the 400x225 golden
# spec) unless a row overrides --scene (texture rows reuse
# book_checker, which carries a checker ground AND a 64x32 image
# texture).
#
# Gate calibration (measured r4 on TPU): fused-vs-megakernel at 64 spp
# floors at 1.32e-3 (baked/cull16, winner attrs packed) / 1.37e-3
# (dynamic-culled, exact float albedo) — near-identical with and
# without packing, so the residual is WINNER-TIE SAMPLE FLIPS (t-ties
# resolved differently by the two sweeps' op orders), whose image
# weight scales ~1/sqrt(spp): the same engines at 1000 spp measure
# 2.1-3.9e-4 (round-3 full-spec gates).  The same-stream gate is
# therefore 2e-3 at 64 spp — above the flip floor, and orders of
# magnitude below a real Mosaic lowering bug (the one observed to date
# measured 0.09).  Texture rows get 3e-3 (fused LUT 10:10:10
# quantization + mean pooling on top of the flip floor).
SAME_STREAM = [
    ("baked_cull16", ["--intersector", "baked", "--clusters", "16"], 2e-3),
    ("dynculled", ["--intersector", "bruteforce", "--clusters", "16"],
     2e-3),
    ("winner_hint", ["--intersector", "baked", "--clusters", "16",
                     "--winner-hint"], 2e-3),
    ("lane_split2", ["--intersector", "baked", "--clusters", "16",
                     "--lane-split", "2"], 2e-3),
    ("rotate_cols2", ["--intersector", "baked", "--clusters", "16",
                      "--rotate-cols", "2"], 2e-3),
    ("recluster2", ["--intersector", "baked", "--clusters", "16",
                    "--recluster", "2"], 2e-3),
    ("recluster2_dyn", ["--intersector", "bruteforce", "--clusters", "16",
                        "--recluster", "2"], 2e-3),
    ("wavefront_matsplit", ["--engine", "wavefront",
                            "--intersector", "bruteforce",
                            "--material-split"], 2e-3),
    # Stratified AA on BOTH engines (same streams, same strata): the
    # remap's Mosaic lowering is gated tight here; its *statistics* are
    # gated by golden_stratified below.
    ("stratified_ss", ["--intersector", "baked", "--clusters", "16",
                       "--sampler", "stratified"], 2e-3),
    # Negative-radius (inside-out) bubble: ADVICE r3 reported an
    # unexplained fused-vs-megakernel RMSE 0.09 on negative-radius
    # scenes ON TPU (CPU interpret is in the normal band) — this row is
    # the detector for that lowering divergence.
    ("negradius_baked", ["--scene", "book_bubble",
                         "--intersector", "baked", "--clusters", "16"],
     2e-3),
    ("textures_baked", ["--scene", "book_checker",
                        "--intersector", "baked", "--clusters", "16"],
     3e-3),
    ("textures_dyn", ["--scene", "book_checker",
                      "--intersector", "bruteforce", "--clusters", "16"],
     3e-3),
]

# Golden rows: full BASELINE spec vs the committed CPU artifact.
GOLDEN_ROWS = [
    ("golden_baked_cull16", ["--intersector", "baked", "--clusters", "16"],
     1e-3),
    ("golden_rr5", ["--intersector", "baked", "--clusters", "16",
                    "--rr", "5"], 1e-3),
    # Stratified CANNOT meet 1e-3 by construction: the golden is a
    # random-sampler render, so this row compares two INDEPENDENT
    # quadratures and floors at the true 1000-spp MC noise — measured
    # 2.84e-3 (frame-0 stratified: the stratum remap reuses the
    # oracle's underlying draws, so the AA dim partially cancels;
    # fully decorrelated random-vs-golden measures 5.07e-3 and
    # stratified-vs-golden 5.00e-3, i.e. stratified BEATS random on
    # equal footing).  The 1e-3 rows pass only because they share the
    # oracle's RNG streams (same quadrature; residual = numerics).
    # Gate 4e-3 = a BIAS detector: the round-5-removed biased scatter
    # stratification measured 5.99e-3 here and would still fail.
    ("golden_stratified", ["--intersector", "baked", "--clusters", "16",
                           "--sampler", "stratified",
                           "--oracle-sampler", "random"], 4e-3),
    ("golden_recluster2", ["--intersector", "baked", "--clusters", "16",
                           "--recluster", "2"], 1e-3),
]

SS_W, SS_H, SS_SPP = 400, 224, 64


def run_row(name: str, args: list[str], gate: float, *, spp: int,
            width: int, height: int, oracle: list[str],
            timeout: int) -> dict:
    cmd = [sys.executable, "-m", "wavefront_path_tracer_tpu.validate",
           "--width", str(width), "--height", str(height),
           "--spp", str(spp), "--gate", repr(gate), "--engine", "fused",
           *oracle, *args]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return {"name": name, "ok": False, "pass": False,
                "error": f"timeout after {timeout}s"}
    dt = time.time() - t0
    line = (p.stdout.strip().splitlines() or [""])[-1]
    try:
        row = json.loads(line)
    except json.JSONDecodeError:
        tail = (p.stderr or p.stdout or "")[-400:]
        return {"name": name, "ok": False, "pass": False,
                "error": f"rc={p.returncode}: {tail}"}
    row.update(name=name, ok=True, wall_s=round(dt, 1))
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of row names to (re)run; other "
                         "existing rows are kept")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-row timeout (first compiles are slow)")
    ap.add_argument("--spp", type=int, default=SS_SPP,
                    help="same-stream rows' sample budget")
    opts = ap.parse_args()

    rows_spec = ([(n, a, g, "ss") for n, a, g in SAME_STREAM]
                 + [(n, a, g, "golden") for n, a, g in GOLDEN_ROWS])
    if opts.list:
        for n, _a, g, kind in rows_spec:
            print(f"{n:22s} gate {g:g}  ({kind})")
        return 0

    only = set(opts.only.split(",")) if opts.only else None
    if only:
        known = {n for n, _a, _g, _k in rows_spec}
        unknown = sorted(only - known)
        if unknown:
            ap.error(f"--only names not in the sweep: {unknown} "
                     f"(see --list)")
    existing = {}
    if only and os.path.exists(OUT):
        with open(OUT) as f:
            existing = {r["name"]: r for r in json.load(f)["rows"]}

    def flush(results):
        n_pass = sum(1 for r in results if r.get("pass"))
        n_skip = sum(1 for r in results if r.get("skipped"))
        # Skipped rows (golden artifact absent) are excluded from
        # all_pass and the exit code: they record "not run", not
        # "failed" (ADVICE r4 — a fresh checkout without the 1000-spp
        # artifact must not report failing gates it never executed).
        summary = {
            "rows": results,
            "passed": n_pass,
            "skipped": n_skip,
            "total": len(results),
            "all_pass": n_pass == len(results) - n_skip,
            "complete": len(results) == len(rows_spec) and n_skip == 0,
            "note": "same-stream rows: fused-variant vs megakernel "
                    "oracle, both on TPU at equal spp (shared RNG "
                    "streams -> MC noise cancels; catches Mosaic "
                    "lowering bugs). golden rows: BASELINE full spec "
                    "vs committed CPU 1000-spp artifact.",
        }
        with open(OUT, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    results = []
    for name, args, gate, kind in rows_spec:
        if only and name not in only:
            if name in existing:
                results.append(existing[name])
            continue
        if kind == "golden":
            if not os.path.exists(GOLDEN):
                results.append({"name": name, "ok": False, "pass": False,
                                "skipped": True,
                                "error": f"golden artifact {GOLDEN} absent"
                                         " (run exp/make_golden.py)"})
                continue
            row = run_row(name, args, gate, spp=1000, width=400,
                          height=225,
                          oracle=["--oracle-cache", GOLDEN],
                          timeout=opts.timeout)
        else:
            # The TPU same-stream oracle is cached per scene/spp; rows
            # on the default scene share one artifact, texture rows
            # render their oracle in-process (cache keyed on metadata
            # would clash across scenes, so those pay the oracle once).
            # Sampler-variant rows also skip the cache: their oracle
            # runs with the test sampler (validate._oracle_sampler), so
            # the shared random-sampler artifact's metadata would
            # (correctly) refuse to load.
            oracle = ["--oracle-spf", str(opts.spp)]
            if "--scene" not in args and "--sampler" not in args:
                oracle += ["--oracle-cache", TPU_ORACLE]
            row = run_row(name, args, gate, spp=opts.spp, width=SS_W,
                          height=SS_H, oracle=oracle,
                          timeout=opts.timeout)
        results.append(row)
        print(json.dumps(row), flush=True)
        flush(results)  # incremental: a killed sweep still
        #                 leaves every finished row on disk

    # Final flush: kept-from-existing rows appended *after* the last
    # run row (the --only merge path) are otherwise never written.
    summary = flush(results)
    n_skip = summary["skipped"]
    msg = f"{summary['passed']}/{len(results) - n_skip} gates pass"
    if n_skip:
        msg += f" ({n_skip} golden rows skipped: artifact absent)"
    print(f"{msg} -> {OUT}", file=sys.stderr)
    return 0 if summary["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
