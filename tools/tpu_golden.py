"""On-hardware golden conformance for the jnp/XLA op paths.

VERDICT r3 item 2: the 180-case oracle suite (tests/goldens/goldens.npz,
generated from the compiled reference library) runs in CI on the 8-device
CPU mesh only, and tools/tpu_suite.py compares Pallas kernels *to the jnp
path* on chip — so nothing proved jnp-on-TPU itself matches the oracle.
TPU libm (tanh/exp/pow) differs from host libm; this script replays every
golden case through the SAME adapters the CPU suite uses
(tests/test_conformance._native) on the real TPU and records per-case /
per-op nonconformance counts instead of asserting.

A case conforms when (a) the mask equals the reference sentinel pattern
exactly (where the case demands mask_exact — same contract as
tests/test_conformance._check) and (b) values agree at the case's
tolerances on commonly-defined points.  Nonconforming cases record the
mismatch counts and the worst absolute/relative errors.

Usage (real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_golden.py \
      [--out TPUTEST_r04.json]
The result merges into the given JSON under "golden_jnp_tpu" (other keys,
e.g. tools/tpu_suite.py's kernel suite, are preserved).
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def run_case(case, goldens, _native, case_inputs, UNDEF):
    """Replay one golden case on the current backend; return a record
    (None when fully conformant at the case's own tolerances)."""
    ins = case_inputs(case)
    out = _native(case, ins)
    outs = list(out) if case.op == "ilevelgwind" else [out]
    refs = [goldens[case.name + "__out"]]
    if case.op == "ilevelgwind":
        refs.append(goldens[case.name + "__out2"])
    rec = {"op": case.op, "n_mask": 0, "n_val": 0, "n_pts": 0,
           "max_abs": 0.0, "max_rel": 0.0}
    for f, ref in zip(outs, refs):
        ref_mask = (ref != UNDEF) & ~np.isnan(ref)
        my_mask = np.asarray(f.mask)
        my_vals = np.asarray(f.values)
        rec["n_pts"] += ref.size
        if case.mask_exact:
            rec["n_mask"] += int((my_mask != ref_mask).sum())
        both = my_mask & ref_mask
        if both.any():
            a, b = my_vals[both].astype(np.float64), ref[both].astype(
                np.float64)
            err = np.abs(a - b)
            tol = case.atol + case.rtol * np.abs(b)
            bad = err > tol
            rec["n_val"] += int(bad.sum())
            if bad.any():
                rec["max_abs"] = max(rec["max_abs"], float(err[bad].max()))
                rel = err[bad] / np.maximum(np.abs(b[bad]), 1e-30)
                rec["max_rel"] = max(rec["max_rel"], float(rel.max()))
    return None if rec["n_mask"] == 0 and rec["n_val"] == 0 else rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="JSON artifact to merge results into")
    ap.add_argument("--cpu", action="store_true",
                    help="sanity run on the CPU backend (must match the "
                         "pytest conformance suite: 0 nonconformant)")
    ap.add_argument("--large", action="store_true",
                    help="replay the production-size 719x929 goldens "
                         "(goldens_large.npz) instead of the 12x10 suite; "
                         "merges under 'golden_large_jnp_tpu'")
    args = ap.parse_args()

    from conformance_cases import CASES, LARGE_CASES, UNDEF, case_inputs
    from test_conformance import _native

    if args.large:
        CASES = LARGE_CASES
    goldens = np.load(os.path.join(
        REPO, "tests", "goldens",
        "goldens_large.npz" if args.large else "goldens.npz"))
    platform = jax.devices()[0].platform
    t0 = time.time()
    bad, ok = {}, 0
    per_op = {}
    for case in CASES:
        rec = run_case(case, goldens, _native, case_inputs, UNDEF)
        op_row = per_op.setdefault(case.op, {"cases": 0, "nonconf": 0,
                                             "n_mask": 0, "n_val": 0})
        op_row["cases"] += 1
        if rec is None:
            ok += 1
        else:
            bad[case.name] = rec
            op_row["nonconf"] += 1
            op_row["n_mask"] += rec["n_mask"]
            op_row["n_val"] += rec["n_val"]
            print(f"NONCONF {case.name}: {rec}", flush=True)
    result = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "cases": len(CASES),
        "conformant": ok,
        "nonconformant": len(bad),
        "per_op": {k: v for k, v in sorted(per_op.items())
                   if v["nonconf"]},
        "ops_all_green": sorted(k for k, v in per_op.items()
                                if not v["nonconf"]),
        "detail": bad,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps({k: result[k] for k in
                      ("platform", "cases", "conformant",
                       "nonconformant", "wall_s")}))
    if args.out:
        path = os.path.join(REPO, args.out)
        doc = {}
        if os.path.exists(path):
            with open(path) as fh:
                doc = json.load(fh)
        doc["golden_large_jnp_tpu" if args.large
            else "golden_jnp_tpu"] = result
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
