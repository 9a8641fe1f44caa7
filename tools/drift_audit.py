"""Same-scale bench drift gate: the round-over-round twin of
tools/scale_audit.py.

scale_audit compares two scale FACTORS of the same code and flags
super-linear growth; this tool compares two rounds of the same scale
factor and flags regressions — the "22 untouched queries drifted
+15-56%" finding the round-4 judge had to assemble by hand. Run it on
the driver's per-round artifacts (e.g. BENCH_r04.json vs
BENCH_r05.json) to separate real plan regressions from host noise
before anyone chases ghosts.

Usage:
    python tools/drift_audit.py BENCH_old.json BENCH_new.json \
        [--max-drift 1.30] [--min-sec 0.5]

Rules:
  * only queries present in BOTH artifacts are compared (the common
    set); new queries have no baseline and are skipped with a note;
  * queries faster than ``min_sec`` in BOTH rounds are skipped —
    sub-second walls are scheduler floor, their ratios are noise;
  * a query slower than ``max_drift`` x old AND slower by at least
    0.5 s absolute FAILS (exit 1). The absolute guard keeps a
    0.6 s -> 0.9 s blip from failing a build while still catching a
    2 s -> 3 s real regression;
  * if the host-load canary (> 1.25x) explains every flagged row, the
    run exits 3, not 0 — load-suspect means "unresolved pending a
    quiet-host re-measure", which callers gating on the exit code must
    be able to tell apart from clean. Exit 2 = refused comparison
    (different sf or timed sink);
  * REGRESSED rows under a QUIET canary are auto-re-measured (round-10
    verdict: the fixed-work canary samples host load around the run,
    not per row, so a transient spike on one query is invisible to it
    — BENCH_r09 vs BENCH_r10 flagged 4 such rows that were all
    at-or-below baseline in every quiet-host artifact). The tool
    re-runs exactly the flagged queries through ``bench.py`` (one
    fresh JVM, noop sink, the same warmup/median discipline) against
    the artifact's scale factor and adjudicates on the re-measure:
    cleared rows are labeled TRANSIENT (not failures), still-slow rows
    stay REGRESSED (exit 1). ``--no-remeasure`` restores the pure
    artifact comparison; if no data dir for the artifact's sf exists,
    the rows are left unresolved with a distinct exit 4.

Artifacts measured on different harness versions (e.g. before/after
the bench clearCache fix) or different run modes (isolated vs full
suite — see SCALE.md) are NOT comparable; this tool cannot detect
that, so compare like with like.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _infer_sf_dir(sf) -> str | None:
    """Locate a data dir for the artifact's scale factor: the driver's
    testdata tree for the small SFs, the gen_sf.py .localdata tree for
    sf1/sf3/sf10."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = str(int(sf)) if float(sf) == int(sf) else str(sf)
    for cand in (
        f"/root/testdata/sf{tag}",
        os.path.join(repo, ".localdata", f"sf{tag}"),
    ):
        if os.path.isdir(cand):
            return cand
    return None


def _remeasure(names: list[str], sf_dir: str) -> dict:
    """Re-run exactly ``names`` through bench.py in ONE fresh JVM (noop
    sink, adaptive warmup, median-of-3 — the identical timing loop the
    artifacts were produced with) and return the parsed result line
    (per-query map + the run's own host-load canary). Flagged
    dependents of a DEP_PAIRS builder get the builder prepended so the
    re-measure never re-pays a one-time build inside the timed row
    (the round-4 index-probe artifact)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import DEP_PAIRS  # noqa: E402

    ordered: list[str] = []
    for n in names:
        builder = DEP_PAIRS.get(n)
        if builder and builder not in ordered:
            ordered.append(builder)
        if n not in ordered:
            ordered.append(n)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), *ordered],
        capture_output=True,
        text=True,
        env=env,
    )
    for ln in reversed(proc.stdout.strip().splitlines()):
        try:
            cand = json.loads(ln.strip())
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(cand, dict) and isinstance(cand.get("queries"), dict):
            return cand
    raise RuntimeError(
        f"re-measure subprocess produced no result line "
        f"(rc={proc.returncode}); stderr tail: {proc.stderr[-2000:]}"
    )


def _adjudicate(
    bad: list[tuple],
    iso: dict[str, float],
    max_drift: float,
    min_abs: float,
) -> tuple[list[tuple], list[str]]:
    """Pass/fail each flagged row on its isolated re-measure: a row is
    TRANSIENT (cleared) if the isolated time is back inside the gate —
    ratio within max_drift of the OLD artifact, or absolute growth
    under the min_abs guard. A row the re-measure could not produce
    stays REGRESSED (fail loud, never silently cleared). Returns the
    confirmed rows plus the per-row report lines (pure function so the
    gate semantics are unit-testable without a JVM)."""
    confirmed: list[tuple] = []
    lines: list[str] = []
    for name, a, b, r in bad:
        t = iso.get(name)
        if t is None:
            confirmed.append((name, a, b, r))
            verdict = "REGRESSED (re-measure missing)"
        elif t / a <= max_drift or (t - a) < min_abs:
            verdict = "TRANSIENT (cleared)"
        else:
            confirmed.append((name, a, t, t / a))
            verdict = "REGRESSED (confirmed)"
        shown = f"{t:7.3f}s" if t is not None else "   n/a "
        lines.append(
            f"  {name:42s} {a:7.3f}s -> {shown} isolated  {verdict}"
        )
    return confirmed, lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-drift", type=float, default=1.30)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--min-abs", type=float, default=0.5)
    ap.add_argument(
        "--no-remeasure",
        action="store_true",
        help="pure artifact comparison: never spawn a re-measure JVM "
        "(offline adjudication of someone else's artifacts)",
    )
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="data dir for the re-measure run; default infers "
        "testdata/.localdata from the artifact's sf field",
    )
    args = ap.parse_args()

    def load(path):
        d = json.load(open(path))
        # the round driver wraps bench.py's line under "parsed"
        d = d.get("parsed") or d
        if "queries" not in d and "queries_file" in d:
            # full-suite bench runs print a compact summary line and
            # write the per-query map to a sibling file (see bench.py)
            sibling = os.path.join(
                os.path.dirname(os.path.abspath(path)), d["queries_file"]
            )
            if not os.path.exists(sibling):
                raise SystemExit(
                    f"{path} is a compact bench summary whose per-query "
                    f"detail file is missing: expected {sibling}. Detail "
                    "files live next to the compact artifact (bench.py "
                    "writes them under bench_artifacts/, which is "
                    "gitignored — `git add -f` the detail when "
                    "committing a canonical artifact, or copy both "
                    "files together)."
                )
            d = json.load(open(sibling))
        return d

    old = load(args.old)
    new = load(args.new)
    if old.get("sf") != new.get("sf"):
        print(
            f"refusing: artifacts are different scale factors "
            f"({old.get('sf')} vs {new.get('sf')}) — use scale_audit.py"
        )
        return 2

    oq, nq = old["queries"], new["queries"]
    # Host-load canary (bench.py emits a fixed-work calibration job per
    # run). If both artifacts carry it, its ratio estimates how much of
    # any uniform inflation is the HOST, not the code: a flagged query
    # whose load-normalized ratio falls back under the gate is labeled
    # LOAD-SUSPECT (warning, exit 0) instead of REGRESSED. Only ratios
    # > 1 excuse anything — a faster host never hides a regression.
    # Harness-version guard: timings taken with different forcing sinks
    # are not comparable (count() pruned map-shaped plans until round 9;
    # the noop sink computes every column). Artifacts without the field
    # predate the noop harness.
    so, sn = old.get("timed_sink", "count"), new.get("timed_sink", "count")
    if so != sn:
        print(
            f"refusing: artifacts were timed with different forcing "
            f"sinks ({so!r} vs {sn!r}) — count()-era numbers are "
            "pruned-plan measurements for map-shaped queries and any "
            "comparison is meaningless for them (SCALE.md round 9)."
        )
        return 2
    cal_ratio = None
    if old.get("calibration_sec") and new.get("calibration_sec"):
        cal_ratio = new["calibration_sec"] / old["calibration_sec"]
        print(
            f"calibration: {old['calibration_sec']:.3f}s -> "
            f"{new['calibration_sec']:.3f}s ({cal_ratio:.2f}x host load)"
        )
    # The canary's own quiet-host spread is ~1.23x (SCALE.md: 0.65-0.80 s
    # across quiet runs), so small ratios carry no load signal and MUST
    # NOT excuse anything — a 1.2x "norm" would wave through a real 1.5x
    # regression. Normalize only above a significance floor that quiet
    # variance cannot reach; observed real contention sits well above it
    # (round 8's phantom was 1.37-1.5x).
    CAL_FLOOR = 1.25
    norm = (
        cal_ratio
        if cal_ratio is not None and cal_ratio > CAL_FLOOR
        else 1.0
    )
    if cal_ratio is not None and 1.0 < cal_ratio <= CAL_FLOOR:
        print(
            f"  (canary ratio {cal_ratio:.2f}x is within quiet-host "
            f"variance (<= {CAL_FLOOR}x) — no load normalization applied)"
        )
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    bad = []
    suspect = []
    improved = 0
    for name in common:
        a, b = oq[name], nq[name]
        if a < args.min_sec and b < args.min_sec:
            print(f"  {name:42s} {a:7.3f}s -> {b:7.3f}s  skip (sub-floor)")
            continue
        ratio = b / a if a > 0 else float("inf")
        if b < a:
            improved += 1
        verdict = "OK"
        if ratio > args.max_drift and (b - a) >= args.min_abs:
            if ratio / norm <= args.max_drift:
                verdict = "LOAD-SUSPECT"
                suspect.append((name, a, b, ratio))
            else:
                verdict = "REGRESSED"
                bad.append((name, a, b, ratio))
        print(
            f"  {name:42s} {a:7.3f}s -> {b:7.3f}s "
            f"{ratio:6.2f}x vs {args.max_drift:.2f}x  {verdict}"
        )
    tot_old = sum(oq[n] for n in common)
    tot_new = sum(nq[n] for n in common)
    if not common or tot_old <= 0:
        print(
            "\nno comparable baseline (empty common set) — "
            "nothing to gate"
        )
        if added:
            print(f"new (no baseline): {', '.join(added)}")
        return 0
    print(
        f"\ncommon set: {len(common)} queries, "
        f"{tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x); {improved} improved"
    )
    if added:
        print(f"new (no baseline, skipped): {', '.join(added)}")
    if removed:
        print(f"removed since old artifact: {', '.join(removed)}")
    if suspect:
        print(
            f"\n{len(suspect)} load-suspect queries (over the gate raw, "
            f"under it after dividing out the {norm:.2f}x calibration "
            "drift — re-measure on a quiet host before chasing):"
        )
        for name, a, b, r in suspect:
            print(f"  {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    if bad:
        print(f"\n{len(bad)} regressed queries:")
        for name, a, b, r in bad:
            print(f"  {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
        # Transient-noise adjudication (round-10 verdict item 5): the
        # canary samples host load AROUND the run, not per row — a
        # transient spike on one query leaves the canary quiet, so
        # "REGRESSED + quiet canary" is exactly the case the artifact
        # pair alone cannot settle. Re-measure those rows isolated and
        # pass/fail on the re-measure. Only the quiet-canary case
        # re-measures: under a loud canary the rows are already
        # LOAD-SUSPECT (exit 3), never REGRESSED.
        if norm == 1.0 and not args.no_remeasure:
            sf_dir = args.sf_dir or _infer_sf_dir(new.get("sf"))
            if sf_dir is None:
                print(
                    "\ncanary is quiet, so these flags may be transient "
                    "per-row host spikes — but no data dir for "
                    f"sf{new.get('sf')} exists to re-measure. UNRESOLVED "
                    "(exit 4): re-run with --sf-dir on a machine with "
                    "the data."
                )
                return 4
            flagged = [name for name, *_ in bad]
            print(
                f"\ncanary is quiet — re-measuring {len(flagged)} "
                f"flagged row(s) isolated against {sf_dir} "
                "(one fresh JVM, noop sink, same timing loop) ..."
            )
            # Up to TWO isolated attempts, adjudicating on the per-row
            # MIN: a fresh few-query JVM reads sub-2 s rows with a
            # C2-JIT/warmup premium the full-suite baseline never paid
            # (round 7 measured the isolation premium at 1.19-1.23x;
            # the audit's own header warns the two bases differ), and a
            # single attempt can also land on a host spike — exactly
            # the failure mode being adjudicated. A REAL regression
            # reads high in BOTH JVMs, so min-of-two never clears one;
            # the second attempt runs only for rows the first could
            # not clear.
            run1 = _remeasure(flagged, sf_dir)
            print(
                f"  (re-measure canary: "
                f"{run1.get('calibration_sec', 'n/a')}s)"
            )
            confirmed, lines = _adjudicate(
                bad, run1["queries"], args.max_drift, args.min_abs
            )
            if confirmed:
                retry_names = [name for name, *_ in confirmed]
                print(
                    f"  {len(retry_names)} row(s) not cleared by "
                    "attempt 1 — second isolated JVM (min of two "
                    "adjudicates):"
                )
                run2 = _remeasure(retry_names, sf_dir)
                print(
                    f"  (re-measure canary: "
                    f"{run2.get('calibration_sec', 'n/a')}s)"
                )
                best = dict(run1["queries"])
                for k, v in run2["queries"].items():
                    best[k] = min(v, best.get(k, v))
                confirmed, lines = _adjudicate(
                    bad, best, args.max_drift, args.min_abs
                )
            for ln_out in lines:
                print(ln_out)
            if not confirmed:
                print(
                    "\nall flagged rows cleared by isolated re-measure "
                    "— transient host noise, not code regressions"
                )
                return 0
            bad = confirmed
            print(f"\n{len(bad)} regressions CONFIRMED by re-measure")
        return 1
    if suspect:
        print(
            "\nno code regressions CONFIRMED, but the load-suspect rows "
            "above are unresolved until re-measured on a quiet host"
        )
        # distinct exit code (round-9 ADVICE): callers gating on the
        # return code must be able to tell "clean" (0) from "pending a
        # quiet-host re-measure" — load-suspect rows exiting 0 would
        # let a genuine regression that coincides with host load pass
        # CI with only the warning text as evidence
        return 3
    print("\nno regressions beyond the drift gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
