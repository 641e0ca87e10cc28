"""E. coli-scale end-to-end assembly run (VERDICT r1 item 2).

Reproduces the reference's input scale — a 4.6 Mb genome at 30x coverage
of ~2.5 kb reads at 15% error (doc/final.tex:125-131: 3 GB FASTQ ->
~0.4 GB 2-bit binary of E. coli C227-11) — as a synthetic dataset, then
runs the batch engine end-to-end and reports reads-aligned/s alongside
Gcells/s.

Usage:
    python benchmarks/ecoli_scale.py [--genome-len 4600000] [--coverage 30]
        [--error-rate 0.15] [--max-round N] [--out DIR]

Writes <out>/metrics.jsonl (per-round records) and <out>/summary.json and
prints the summary as one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def derive_cumulative(metrics_path, wall, dp_cells, single_contig=True):
    """Cumulative accounting across checkpoint resumes and multi-contig
    restarts: each process's metrics rows carry an elapsed-time 't' that
    resets on restart, plus dp_cells per round. Returns (wall_cum,
    dp_cells_cum, steady) — whole-experiment wall (sum of per-segment
    maxima), dp cells (last occurrence per round wins so a replayed
    post-checkpoint round isn't double-counted), and second-half
    steady-state throughput with the round-time distribution.

    Markers group into experiment CHAINS: a chain begins at a non-resume
    run_start from a NEW pid (a genuinely fresh process); resume markers
    and same-pid restarts (multi-contig mode emits one fresh marker per
    contig) extend the current chain. Counting starts at the last chain,
    so a reused --out dir drops unrelated older experiments but
    kill+--resume and multi-contig restarts keep their full history."""
    wall_cum, dp_cells_cum, steady = wall, dp_cells, None
    try:
        rows = []
        with open(metrics_path) as fh:
            for line in fh:
                r = json.loads(line)
                if r.get("event") in ("round", "run_start"):
                    rows.append(r)
        chain_start = 0
        prev_pid = None
        for i, r in enumerate(rows):
            if r.get("event") != "run_start":
                continue
            pid = r.get("pid")
            if not r.get("resume") and (pid is None or pid != prev_pid):
                chain_start = i
            prev_pid = pid
        rows = rows[chain_start:]
        seg_max, last_t, w = 0.0, None, 0.0
        per_round = {}
        for r in rows:
            t = float(r["t"])
            # a run_start marker is a definitive process boundary (robust
            # even when the resumed process outlasts the killed one, which
            # the t-decrease heuristic alone would miss)
            if r.get("event") == "run_start" or (
                last_t is not None and t < last_t
            ):
                w += seg_max
                seg_max = 0.0
            seg_max = max(seg_max, t)
            last_t = t
            if r.get("event") == "round":
                per_round[int(r["nround"])] = int(r.get("dp_cells", 0))
        w += seg_max
        if w > wall:
            wall_cum = w
        if single_contig:
            dp_cells_cum = max(dp_cells, sum(per_round.values()))
        # steady-state throughput: the whole-run number amortizes the
        # per-process Mosaic compile warmup (the axon remote-compile path
        # does not hit jax's persistent cache across processes; 10-30 s
        # per first-seen size bucket) over the run. Report the second
        # half of the rounds separately so engine speed and one-time
        # compile cost are distinguishable.
        rr = [r for r in rows if r.get("event") == "round"]
        half = rr[len(rr) // 2:]
        if half:
            sw = sum(float(r["round_s"]) for r in half)
            sc = sum(int(r.get("nmatches", 0)) for r in half)
            ts = sorted(float(r["round_s"]) for r in half)
            if sw > 0:
                steady = {
                    "rounds": len(half),
                    "reads_per_s": round(sc / sw, 2),
                    "round_s_p50": round(ts[len(ts) // 2], 2),
                    "round_s_p95": round(ts[int(len(ts) * 0.95)], 2),
                    "round_s_p99": round(ts[int(len(ts) * 0.99)], 2),
                }
    except (OSError, ValueError, KeyError):
        pass
    return wall_cum, dp_cells_cum, steady


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-len", type=int, default=4_600_000)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--mean-read-len", type=int, default=2500)
    ap.add_argument("--error-rate", type=float, default=0.15)
    ap.add_argument("--error-profile", choices=("uniform", "clr"), default="uniform",
                    help="uniform sub/ins/del thirds, or PacBio CLR-like "
                         "1:12:4 (insertion-dominated raw error)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--contigs", type=int, default=1,
                    help="assemble up to N contigs (restart on survivors)")
    ap.add_argument("--max-round", type=int, default=None,
                    help="bound rounds (default: run to convergence)")
    ap.add_argument("--out", default="/tmp/pbtpu_ecoli")
    ap.add_argument("--backend", default=None,
                    help="override PBTPU_SCREEN_BACKEND")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (JAX_PLATFORMS is "
                         "overridden by the axon plugin; only the in-process "
                         "config update works — see tests/conftest.py)")
    ap.add_argument("--no-dedupe", action="store_true",
                    help="disable diagonal candidate dedupe")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <out>/ck.npz")
    ap.add_argument("--edge-retreat", type=int, default=0,
                    help="stall-recovery budget (trim single-read edge "
                         "fringe and keep going instead of terminating)")
    ap.add_argument("--retreat-bite", type=int, default=0,
                    help="escalation: cells to cut per edge when a stall's "
                         "weak-fringe trim removes nothing (0 = off)")
    ap.add_argument("--retreat-min-len", type=int, default=0,
                    help="skip retreats on contigs shorter than this "
                         "(multi-contig junk-restart guard)")
    ap.add_argument("--retreat-fruitless", type=int, default=0,
                    help="stop after N consecutive retreats with zero "
                         "matches (unalignable-survivor escape; 0 = off)")
    ap.add_argument("--max-trial", type=int, default=32,
                    help="seeding trials per read per direction (-t)")
    ap.add_argument("--rng-seed", type=int, default=7)
    ap.add_argument("--no-account", action="store_true",
                    help="skip the surviving-read classification pass "
                         "(multi-contig runs only)")
    args = ap.parse_args()

    if args.backend:
        os.environ["PBTPU_SCREEN_BACKEND"] = args.backend
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    from pacbioassembly_tpu.assemble import ReadStore
    from pacbioassembly_tpu.assemble.batch import BatchAssembler
    from pacbioassembly_tpu.codec import binary_io, dna
    from pacbioassembly_tpu.config import AssemblyConfig
    from pacbioassembly_tpu.tools.simulate import SimConfig, simulate, split_error_rate
    from pacbioassembly_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    prof_tag = "" if args.error_profile == "uniform" else f"_{args.error_profile}"
    bin_path = os.path.join(
        args.out,
        f"reads_{args.genome_len}_{args.coverage:g}_{args.error_rate:g}"
        f"{prof_tag}_{args.seed}.bin",
    )
    genome_path = os.path.join(args.out, "genome.txt")
    if not os.path.exists(bin_path):
        log(f"simulating {args.genome_len/1e6:.1f} Mb @ {args.coverage}x "
            f"({args.error_profile} errors) ...")
        t0 = time.time()
        sub, ins, dele = split_error_rate(args.error_rate, args.error_profile)
        sim = SimConfig(
            genome_len=args.genome_len,
            coverage=args.coverage,
            mean_read_len=args.mean_read_len,
            sub_rate=sub,
            ins_rate=ins,
            del_rate=dele,
            seed=args.seed,
        )
        genome, reads_list, _ = simulate(sim)
        with open(bin_path + ".tmp", "wb") as fh:
            binary_io.write_records(fh, reads_list)
        os.replace(bin_path + ".tmp", bin_path)
        with open(genome_path, "w") as fh:
            fh.write(dna.codes_to_text(genome) + "\n")
        log(f"  wrote {len(reads_list)} reads, "
            f"{os.path.getsize(bin_path)/1e6:.0f} MB in {time.time()-t0:.0f}s")

    cfg = AssemblyConfig(
        engine="batch",
        max_round=args.max_round,
        rng_seed=args.rng_seed,
        pattern_schedule="random",
        dedupe_diagonals=not args.no_dedupe,
        edge_retreat=args.edge_retreat,
        edge_retreat_bite=args.retreat_bite,
        edge_retreat_min_len=args.retreat_min_len,
        edge_retreat_fruitless=args.retreat_fruitless,
        max_trial=args.max_trial,
        max_seq_len=args.genome_len + 500_000,
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
        checkpoint_path=os.path.join(args.out, "ck.npz"),
        checkpoint_every=50,
        resume_path=os.path.join(args.out, "ck.npz") if args.resume else None,
    )
    t0 = time.time()
    reads = ReadStore.from_file(bin_path, cfg)
    patterns = dna.load_patterns(
        os.path.join(os.path.dirname(__file__), "..", "tests", "data", "seeds.txt")
    )
    setup_s = time.time() - t0
    log(f"loaded {len(reads)} reads in {setup_s:.1f}s; assembling ...")

    t1 = time.time()
    if args.contigs > 1:
        # resumable per-contig loop (the library one-shot is
        # assemble_contigs; this adds contig-granularity resume plus
        # per-contig round checkpoints, because a multi-hour run behind
        # the tunnel must survive a killed process): contig ci resumes
        # from ck_ci.npz if present, completed contigs from wg_state.npz
        import dataclasses

        from pacbioassembly_tpu.assemble.batch import ContigResult

        state_path = os.path.join(args.out, "wg_state.npz")
        contig_results: list = []
        surviving = None
        cache = builder = None
        ci0 = 0
        if args.resume and os.path.exists(state_path):
            st = np.load(state_path, allow_pickle=True)
            for codes, nreads, nrounds in zip(
                st["contigs"], st["nreads"], st["nrounds"]
            ):
                contig_results.append(
                    ContigResult(np.asarray(codes, np.uint8), int(nreads), int(nrounds))
                )
            surviving = st["surviving"].astype(np.int64).tolist()
            ci0 = len(contig_results)
            log(f"resuming at contig {ci0} ({len(surviving)} reads left)")
        for ci in range(ci0, args.contigs):
            ck = os.path.join(args.out, f"ck_{ci}.npz")
            c = dataclasses.replace(
                cfg,
                rng_seed=cfg.rng_seed + ci,
                checkpoint_path=ck,
                resume_path=ck if (args.resume and os.path.exists(ck)) else None,
            )
            asm = BatchAssembler(
                c, reads, patterns,
                surviving=surviving, trial_cache=cache, device_builder=builder,
            )
            if not asm.surviving:
                break
            before = len(asm.surviving)
            asm.run(out=None, log=sys.stderr)
            contig_results.append(ContigResult(
                codes=asm.ref.text().copy(),
                nreads=before - len(asm.surviving),
                nrounds=asm.nround,
            ))
            log(f"=== contig {ci}: {len(contig_results[-1].codes)} bp from "
                f"{contig_results[-1].nreads} reads in {asm.nround} rounds; "
                f"{len(asm.surviving)} reads left")
            surviving = asm.surviving
            cache, builder = asm._trial_cache, asm._device_builder
            del asm
            np.savez(
                state_path,
                contigs=np.array(
                    [c.codes for c in contig_results], dtype=object
                ),
                nreads=np.array([c.nreads for c in contig_results]),
                nrounds=np.array([c.nrounds for c in contig_results]),
                surviving=np.array(surviving, dtype=np.int64),
            )
            if os.path.exists(ck):
                os.remove(ck)  # contig finalized; round checkpoint obsolete
            if not surviving:
                break
        wall = time.time() - t1
        # containment dedup: restarts can re-assemble scraps of genome an
        # earlier contig already covers; drop (self-contained, no genome
        # truth) contigs >= 80% collinear with a larger one
        from pacbioassembly_tpu.tools.postprocess import dedupe_contigs

        kept, dropped_contained = dedupe_contigs(
            [c.codes for c in contig_results]
        )
        if dropped_contained:
            for d in dropped_contained:
                d["len"] = len(contig_results[d["idx"]].codes)
            log(f"dedup: dropped {len(dropped_contained)} contained "
                f"contig(s): {dropped_contained}")
            contig_results = [contig_results[i] for i in kept]
        contig_lens = sorted((len(c.codes) for c in contig_results), reverse=True)
        best = max(contig_results, key=lambda c: len(c.codes))
        best_codes = best.codes
        surviving = surviving if surviving is not None else list(range(len(reads)))
        consumed = len(reads) - len(surviving)
        rounds = sum(c.nrounds for c in contig_results)
        # sentinel: retreats/dp_cells are per-assembler state that is not
        # aggregated across multi-contig restarts; -1/0 mean "not tracked
        # in this mode", NOT zero retreats (documented in summary too)
        retreats = -1
        dp_cells = 0
        for ci, c in enumerate(contig_results):
            with open(os.path.join(args.out, f"contig_{ci}.txt"), "w") as fh:
                fh.write(dna.codes_to_text(c.codes) + "\n")
    else:
        asm = BatchAssembler(cfg, reads, patterns)
        asm.run(out=io.StringIO(), log=sys.stderr)
        wall = time.time() - t1
        best_codes = asm.ref.text()
        contig_lens = [len(best_codes)]
        consumed = len(reads) - len(asm.surviving)
        surviving = asm.surviving
        rounds = asm.nround
        retreats = asm.retreats
        dp_cells = asm.dp_cells_total
        dropped_contained = []

    wall_cum, dp_cells_cum, steady = derive_cumulative(
        cfg.metrics_path, wall, dp_cells, single_contig=args.contigs == 1
    )

    # contig quality, the reference's way (doc/final.tex:266-277): map
    # fresh low-error CCS-like reads onto the contig with the batched
    # locator and report cost per matched base
    from pacbioassembly_tpu.tools.locate import residual_error
    from pacbioassembly_tpu.tools.simulate import SimConfig as _SC
    from pacbioassembly_tpu.tools.simulate import simulate as _simulate

    log("measuring residual error (locator vs CCS-like 1%-error reads) ...")
    with open(genome_path) as fh:
        genome = dna.text_to_codes(fh.readline().strip())
    ccs_sim = _SC(
        genome_len=len(genome), coverage=2.0, mean_read_len=2500,
        sub_rate=0.004, ins_rate=0.003, del_rate=0.003, seed=args.seed + 1,
    )
    _, ccs_reads, _ = _simulate(ccs_sim, genome=genome)
    quality = residual_error(best_codes, patterns[0], ccs_reads, ratio=0.15)

    # whole-assembly evaluation: genome fraction covered + N50/NG50 by
    # unique-16-mer anchoring (tools/coverage.py), and the aggregate
    # residual over every contig big enough to matter
    from pacbioassembly_tpu.tools.coverage import evaluate_assembly

    all_contigs = (
        [c.codes for c in contig_results] if args.contigs > 1 else [best_codes]
    )
    log("evaluating genome coverage ...")
    cov = evaluate_assembly(genome, all_contigs)
    agg_cost, agg_len = 0, 0
    per_contig_quality = []
    for ci, codes in enumerate(all_contigs):
        if len(all_contigs) > 1 and len(codes) >= 50_000:
            log(f"  residual of contig {ci} ({len(codes)} bp) ...")
            q = residual_error(codes, patterns[0], ccs_reads, ratio=0.15)
        elif len(all_contigs) == 1:
            q = quality
        else:
            q = None  # tiny contig: skip the locator pass
        per_contig_quality.append(None if q is None else q["residual_error"])
        if q is not None:
            agg_cost += q["total_cost"]
            agg_len += q["total_len"]
        cov["per_contig"][ci]["residual_error"] = (
            None if q is None else q["residual_error"]
        )
    assembly_residual = round(agg_cost / agg_len, 4) if agg_len else None

    # full read-set accounting: classify every unconsumed read against
    # the final contigs (mapped = its region IS assembled; seeded_only =
    # seed hits but unalignable; unseedable = no seed trial occurs in any
    # contig) so the summary accounts for 100% of the input reads
    read_accounting = None
    if args.contigs > 1 and not args.no_account and surviving:
        from pacbioassembly_tpu.tools.postprocess import classify_reads

        log(f"classifying {len(surviving)} surviving reads ...")
        t_acc = time.time()
        res = classify_reads(
            all_contigs, [reads.codes(i) for i in surviving],
            patterns[0], ratio=cfg.ratio,
        )
        read_accounting = {
            k: res[k]
            for k in ("total", "mapped", "seeded_only", "unseedable", "too_short")
        }
        read_accounting["classify_s"] = round(time.time() - t_acc, 1)
        log(f"  {read_accounting}")

    summary = {
        "metric": "reads_aligned_per_s",
        "value": round(consumed / wall_cum, 2),
        "unit": "reads/s",
        "genome_len": args.genome_len,
        "coverage": args.coverage,
        "error_rate": args.error_rate,
        "error_profile": args.error_profile,
        "n_reads": len(reads),
        "reads_consumed": consumed,
        "reads_unconsumed": len(reads) - consumed,
        **({"unconsumed_accounting": read_accounting} if read_accounting else {}),
        **(
            {"contigs_dropped_contained": dropped_contained}
            if dropped_contained
            else {}
        ),
        "rounds": rounds,
        "retreats": retreats,
        **(
            {"retreats_note": "-1 = not tracked across multi-contig restarts"}
            if retreats < 0
            else {}
        ),
        "contig_len": int(contig_lens[0]),
        "contig_lens": [int(x) for x in contig_lens],
        "residual_error": quality["residual_error"],
        "assembly_residual_error": assembly_residual,
        "genome_fraction": cov["genome_fraction"],
        "genome_covered": cov["genome_covered"],
        "n50": cov["n50"],
        "ng50": cov["ng50"],
        "coverage_eval": cov,
        "quality": quality,
        "steady_state": steady,
        "wall_s": round(wall_cum, 1),
        "wall_s_this_process": round(wall, 1),
        "setup_s": round(setup_s, 1),
        "dp_cells_total": dp_cells_cum,
        "dp_gcells_per_s": round(dp_cells_cum / wall_cum / 1e9, 2),
        "bin_bytes": os.path.getsize(bin_path),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    with open(os.path.join(args.out, "contig.txt"), "w") as fh:
        fh.write(dna.codes_to_text(best_codes) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
