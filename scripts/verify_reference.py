#!/usr/bin/env python
"""One-command reconstruction-vs-source verifier (verdict r2, item #1).

The SURVEY.md blueprint for this framework is a RECONSTRUCTION: the
read-only reference mount (`/root/reference/`) has been an empty directory
every session of rounds 1-3, so every architecture table, flag name,
scheduler rule, and protocol constant in `dynseg/` carries a MED/LOW
confidence tag instead of a real file:line citation.

The moment the mount (or any checkout of
keillernogueira/dynamic-rs-segmentation) becomes readable, run:

    python scripts/verify_reference.py [--reference /root/reference]
                                       [--out docs/REFERENCE_DIFF.md]

and it will, in one pass:

  * index every text file in the reference tree,
  * check each reconstructed FACT below against the source (regex-based;
    CONFIRMED facts get real file:line anchors),
  * extract the network-builder function bodies and print them next to
    this repo's `_ARCH` tables for the five variants,
  * excerpt the scheduler score-update / scale-selection code (the
    highest-stakes MED-confidence semantics: sign, EMA-vs-mean, cadence),
  * write a markdown discrepancy report (default docs/REFERENCE_DIFF.md)
    listing CONFIRMED / NOT FOUND / MANUAL-REVIEW items with next actions.

Exit codes: 0 = reference populated, report written;
            2 = reference still empty/missing (dated note printed).

After the report: fix any NOT FOUND / contradicted fact in the named
dynseg file, then run `scripts/parity_bracket.py` and
`scripts/run_folds.py` against the verified semantics (SURVEY.md §9).
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# The reconstructed facts. Each entry:
#   id        short slug
#   component SURVEY.md component the fact belongs to
#   claim     what this repo's implementation assumes (with our anchor)
#   patterns  regexes; any match in any reference file counts
#   mode      "confirm" (existence check) or "manual" (existence check +
#             context excerpt in the report — semantics need human eyes)
# ---------------------------------------------------------------------------
FACTS = [
    # --- network variants (C6-C10) -------------------------------------
    dict(id="net-icpr_rate6", component="C6",
         claim="builder named dilated_icpr_rate6 exists "
               "(dynseg/models/dilated.py _ARCH)",
         patterns=[r"def\s+dilated_icpr_rate6\b", r"dilated_icpr_rate6"],
         mode="confirm"),
    dict(id="net-icpr_densely", component="C7",
         claim="builder dilated_icpr_rate6_densely exists; dense concat "
               "wiring (dynseg/models/dilated.py DilatedDenseNet)",
         patterns=[r"dilated_icpr_rate6_densely", r"densely"],
         mode="manual"),
    dict(id="net-grsl", component="C8",
         claim="builder dilated_grsl exists (5 blocks)",
         patterns=[r"dilated_grsl\b"], mode="confirm"),
    dict(id="net-grsl_rate8", component="C9",
         claim="builder dilated_grsl_rate8 exists (dilations ramp to 8)",
         patterns=[r"dilated_grsl_rate8"], mode="confirm"),
    dict(id="net-original", component="C10",
         claim="a non-dilated baseline variant exists "
               "(we guessed the name dilated_icpr_original — LOW conf)",
         patterns=[r"dilated_icpr_original", r"icpr_original",
                   r"def\s+icpr\b"], mode="manual"),
    # --- layer math -----------------------------------------------------
    dict(id="dilated-conv", component="C6/L0",
         claim="convs use dilation (atrous_conv2d or conv2d dilations=)",
         patterns=[r"atrous_conv2d", r"dilation", r"rate\s*="],
         mode="manual"),
    dict(id="stride1-pool", component="C6/§3.3",
         claim="max-pools are 3x3 stride-1 SAME (no downsampling anywhere) "
               "(dynseg/config.py pool_window=3; blocks.py)",
         patterns=[r"max_pool", r"max_pooling"], mode="manual"),
    dict(id="leaky-relu", component="C6/C8",
         claim="activation is leaky ReLU, slope 0.1 "
               "(dynseg/config.py leaky_slope=0.1 — MED conf; bracket "
               "found slope irrelevant on the texture benchmark)",
         patterns=[r"leaky_relu", r"leaky", r"tf\.maximum\s*\("],
         mode="manual"),
    dict(id="batch-norm", component="C6",
         claim="conv blocks contain batch-norm "
               "(dynseg/config.py use_batch_norm=True — bracket +1.0pp)",
         patterns=[r"batch_norm", r"batch_normalization"], mode="manual"),
    dict(id="initializer", component="C6/C11",
         claim="conv kernels use xavier/glorot or truncated-normal init "
               "(parity-critical; we use flax default lecun_normal unless "
               "verified otherwise — dynseg/models/blocks.py)",
         patterns=[r"xavier", r"glorot", r"truncated_normal",
                   r"variance_scaling", r"random_normal"], mode="manual"),
    dict(id="dropout", component="C6",
         claim="dropout placement/rate (we default rate=0.0, LOW conf)",
         patterns=[r"dropout"], mode="manual"),
    # --- loss & optimizer (C11) ------------------------------------------
    dict(id="loss-softmax-ce", component="C11",
         claim="loss = sparse softmax cross-entropy per pixel "
               "(dynseg/train.py masked CE)",
         patterns=[r"sparse_softmax_cross_entropy",
                   r"softmax_cross_entropy"], mode="confirm"),
    dict(id="weight-decay", component="C11",
         claim="L2 weight decay on conv kernels only, added to loss "
               "(dynseg/train.py kernel-only L2)",
         patterns=[r"l2_loss", r"weight_decay"], mode="manual"),
    dict(id="optimizer", component="C11",
         claim="MomentumOptimizer, momentum 0.9, lr ~0.01 "
               "(dynseg/train.py optax.sgd(momentum=0.9))",
         patterns=[r"MomentumOptimizer", r"momentum"], mode="manual"),
    dict(id="lr-decay", component="C11",
         claim="LR schedule (exponential decay? — LOW conf; we expose "
               "--lr_decay_rate/--lr_decay_steps, default constant)",
         patterns=[r"exponential_decay", r"learning_rate_decay",
                   r"lr_decay"], mode="manual"),
    # --- scheduler (C12) — THE core semantics ---------------------------
    dict(id="dist-types", component="C12",
         claim="distribution_type in {single_fixed, multi_fixed, uniform, "
               "multinomial} (dynseg/sched/scheduler.py)",
         patterns=[r"single_fixed", r"multi_fixed", r"multinomial"],
         mode="confirm"),
    dict(id="uniform-support", component="C12",
         claim="the 'uniform' distribution's SUPPORT: our scheduler "
               "samples uniformly over the --values LIST "
               "(dynseg/sched/scheduler.py _select uniform branch); "
               "SURVEY.md C12's wording ('uniform over range') admits a "
               "second reading — uniform over the 25..65 INTEGER range — "
               "which would feed the net patch sizes never bucketed. "
               "Check which support the reference's uniform branch draws "
               "from (np.random.randint over a range vs random.choice "
               "over the values list) — a semantic divergence flagged by "
               "the r3 judge (VERDICT r3 'What's missing' #1)",
         patterns=[r"uniform", r"randint", r"random\.choice",
                   r"random_integers"], mode="manual"),
    dict(id="sched-update", component="C12",
         claim="score update rule: per-scale scores updated each batch "
               "from loss or acc; favor HIGH score (paper reading; "
               "--sched_favor high default); EMA 0.9 (MED conf) "
               "(dynseg/sched/scheduler.py update())",
         patterns=[r"update_type", r"score", r"probab"], mode="manual"),
    dict(id="patch-values", component="C12",
         claim="default patch-size list 25,35,45,55,65 "
               "(dynseg/config.py DEFAULT_SCALES)",
         patterns=[r"25\s*,\s*35\s*,\s*45\s*,\s*55\s*,\s*65",
                   r"crop_size"], mode="manual"),
    # --- data layer (C2-C5, C14) -----------------------------------------
    dict(id="mean-std-norm", component="C3",
         claim="per-channel mean/std over TRAINING images, applied "
               "train+test (dynseg/data/tiles.py compute_stats)",
         patterns=[r"compute_image_mean", r"\bmean\b.*\bstd\b",
                   r"normalize_images"], mode="manual"),
    dict(id="balanced-sampling", component="C4",
         claim="per-class-balanced patch sampling "
               "(dynseg/data/sampler.py position tables)",
         patterns=[r"class_distribution", r"balanc",
                   r"dynamically_create_patches"], mode="manual"),
    dict(id="augmentation", component="C5",
         claim="rotation (90-multiples) + flips on patch AND label "
               "(dynseg/ops/gather.py dihedral_batch)",
         patterns=[r"rot90", r"fliplr", r"flipud", r"flip"], mode="manual"),
    dict(id="mirror-pad", component="C14",
         claim="test tiles mirror-padded by ~crop/2 "
               "(dynseg/data/tiles.py mirror_pad, reflect mode)",
         patterns=[r"manipulate_border", r"reflect", r"symmetric",
                   r"mirror"], mode="manual"),
    # --- inference (C15) --------------------------------------------------
    dict(id="window-stride", component="C15",
         claim="sliding-window stride (we measured lambda/2 overlap "
               "accuracy-correct — BENCHMARKS 'Window stride'; "
               "dynseg/config.py stride_fraction=0.5)",
         patterns=[r"stride", r"step"], mode="manual"),
    dict(id="softmax-voting", component="C15",
         claim="softmax probabilities accumulated over overlaps+scales, "
               "averaged, argmax (dynseg/infer.py overlap-add)",
         patterns=[r"softmax", r"prob"], mode="manual"),
    # --- metrics / ckpt / cli (C1, C16, C17) ------------------------------
    dict(id="metrics", component="C17",
         claim="OA + Cohen's kappa + per-class F1 + confusion matrix "
               "(dynseg/metrics.py)",
         patterns=[r"kappa", r"f1", r"confusion"], mode="confirm"),
    dict(id="checkpointing", component="C16",
         claim="tf.train.Saver periodic save + restore for testing "
               "(dynseg/checkpoint.py orbax equivalent)",
         patterns=[r"tf\.train\.Saver", r"Saver\(", r"\.restore\(",
                   r"\.save\("], mode="confirm"),
    dict(id="cli-operation", component="C1",
         claim="CLI has --operation {training, validate_test-ish} "
               "(dynseg/cli.py mirrors flag names)",
         patterns=[r"operation"], mode="manual"),
    dict(id="cli-flags", component="C1",
         claim="flags: dataset/net_type/learning_rate/weight_decay/"
               "batch_size/niter/distribution_type/values/update_type/fold "
               "(dynseg/cli.py build_argparser)",
         patterns=[r"net_type", r"distribution_type", r"update_type"],
         mode="manual"),
    # --- datasets (C2) ----------------------------------------------------
    dict(id="ds-coffee", component="C2",
         claim="Brazilian Coffee 5-fold cross-county protocol; on-disk "
               "layout INVENTED in dynseg/data/datasets.py load_coffee "
               "(runtime-flagged — rework on first contact likely)",
         patterns=[r"coffee"], mode="manual"),
    dict(id="ds-grss", component="C2",
         claim="GRSS DFC 2014 5-class loader; layout INVENTED "
               "(datasets.py load_grss)",
         patterns=[r"grss", r"dfc"], mode="manual"),
    dict(id="ds-isprs", component="C2",
         claim="Vaihingen val tiles 11/15/28/30/34; Potsdam split "
               "LOW confidence (datasets.py _load_isprs)",
         patterns=[r"vaihingen", r"potsdam", r"top_mosaic", r"area"],
         mode="manual"),
]

# Net builders whose full source we excerpt next to our _ARCH tables.
NET_NAMES = ["dilated_icpr_rate6", "dilated_icpr_rate6_densely",
             "dilated_grsl", "dilated_grsl_rate8", "dilated_icpr_original"]

TEXT_EXTS = {".py", ".md", ".txt", ".sh", ".cfg", ".ini", ".yaml", ".yml",
             ".json", ""}


def _index_reference(root):
    """-> list of (relpath, [lines])."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in (".git",)]
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1].lower() not in TEXT_EXTS:
                continue
            path = os.path.join(dirpath, fn)
            try:
                with open(path, errors="replace") as f:
                    lines = f.read().splitlines()
            except OSError:
                continue
            if len(lines) > 50000:  # not a source file
                continue
            out.append((os.path.relpath(path, root), lines))
    return out


def _search(files, pattern):
    """-> list of (relpath, lineno (1-based), line) matches."""
    rx = re.compile(pattern, re.IGNORECASE)
    hits = []
    for rel, lines in files:
        for i, line in enumerate(lines):
            if rx.search(line):
                hits.append((rel, i + 1, line.rstrip()))
    return hits


def _extract_function(files, name, max_lines=120):
    """Best-effort: source of `def <name>` (or the region around the first
    mention) from the python files. Returns (relpath, start_line, [lines])
    or None."""
    defrx = re.compile(rf"^(\s*)def\s+{re.escape(name)}\b")
    for rel, lines in files:
        if not rel.endswith(".py"):
            continue
        for i, line in enumerate(lines):
            m = defrx.match(line)
            if not m:
                continue
            indent = len(m.group(1))
            end = i + 1
            while end < len(lines) and end - i < max_lines:
                s = lines[end]
                if s.strip() and (len(s) - len(s.lstrip())) <= indent \
                        and not s.lstrip().startswith(("#", ")", "]")):
                    break
                end += 1
            return rel, i + 1, lines[i:end]
    return None


def _context(files, rel, lineno, before=3, after=8):
    for r, lines in files:
        if r == rel:
            lo = max(0, lineno - 1 - before)
            hi = min(len(lines), lineno - 1 + after)
            return lines[lo:hi], lo + 1
    return [], lineno


def _our_arch_tables():
    try:
        sys.path.insert(0, REPO)
        from dynseg.models.dilated import _ARCH
        return {k: v for k, v in _ARCH.items()}
    except Exception as e:  # keep the verifier usable standalone
        return {"<import failed>": str(e)}


def run(reference: str, out_path: str) -> int:
    today = datetime.date.today().isoformat()
    if not os.path.isdir(reference) or not any(os.scandir(reference)):
        print(f"[{today}] /root/reference status: STILL EMPTY "
              f"({reference!r} has no entries).")
        print("Nothing to verify. SURVEY.md §0 reconstruction remains the "
              "blueprint. Re-run this script the moment the mount is "
              "populated — the verification pass then costs minutes.")
        return 2

    files = _index_reference(reference)
    print(f"[{today}] reference populated: {len(files)} text files indexed "
          f"under {reference}")

    confirmed, notfound, manual = [], [], []
    report = []
    report.append(f"# REFERENCE_DIFF — reconstruction vs source ({today})\n")
    report.append(f"Source tree: `{reference}` — {len(files)} text files.\n")
    report.append(
        "Legend: **CONFIRMED** = pattern found (anchor given); "
        "**NOT FOUND** = no pattern matched — the reconstruction is "
        "suspect, fix the named dynseg file; **MANUAL** = matched, but the "
        "semantics need human eyes on the excerpt.\n")

    for fact in FACTS:
        all_hits = []
        for pat in fact["patterns"]:
            all_hits.extend(_search(files, pat))
            if len(all_hits) >= 5:
                break
        status = ("NOT FOUND" if not all_hits else
                  ("CONFIRMED" if fact["mode"] == "confirm" else "MANUAL"))
        (notfound if not all_hits else
         (confirmed if status == "CONFIRMED" else manual)).append(fact["id"])
        report.append(f"## [{status}] {fact['id']} ({fact['component']})\n")
        report.append(f"Claim: {fact['claim']}\n")
        for rel, ln, line in all_hits[:5]:
            report.append(f"- `{rel}:{ln}`: `{line.strip()[:120]}`")
        if status == "MANUAL" and all_hits:
            rel, ln, _ = all_hits[0]
            ctx, start = _context(files, rel, ln)
            report.append(f"\nExcerpt (`{rel}:{start}`):\n```")
            report.extend(ctx)
            report.append("```")
        report.append("")

    # --- architecture tables side-by-side -------------------------------
    report.append("## Architecture tables — ours vs source\n")
    report.append("Ours (`dynseg/models/dilated.py:_ARCH`, tuples are "
                  "(kernel, features, dilation, pool)):\n```")
    for name, table in _our_arch_tables().items():
        report.append(f"{name}: {table}")
    report.append("```\n")
    for name in NET_NAMES:
        got = _extract_function(files, name)
        if got is None:
            report.append(f"### {name}: builder function NOT FOUND in "
                          "source (check the name, then fix _ARCH)\n")
            if name not in notfound:
                notfound.append(f"arch-{name}")
            continue
        rel, ln, body = got
        report.append(f"### {name} (`{rel}:{ln}`)\n```python")
        report.extend(body)
        report.append("```\n")
        manual.append(f"arch-{name}")

    # --- summary ----------------------------------------------------------
    summary = (f"CONFIRMED {len(confirmed)} | MANUAL-REVIEW {len(manual)} | "
               f"NOT FOUND {len(notfound)}")
    report.insert(3, f"**Summary: {summary}**\n")
    if notfound:
        report.insert(4, "NOT FOUND (fix these first): " +
                      ", ".join(notfound) + "\n")
    report.append("## Next actions\n")
    report.append("1. Fix every NOT FOUND fact in the named `dynseg/` "
                  "file; replace SURVEY.md [R]/MED anchors with the "
                  "file:line anchors above.")
    report.append("2. Eyeball each MANUAL excerpt — especially "
                  "`sched-update` (sign/EMA/cadence), `initializer`, "
                  "`window-stride`, and the architecture tables.")
    report.append("3. Re-run `scripts/parity_bracket.py` with the verified "
                  "semantics, then `scripts/run_folds.py` on real data "
                  "(targets: BASELINE.md ±0.5% F1).")

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(report) + "\n")
    print(summary)
    print(f"report written: {out_path}")
    if notfound:
        print("NOT FOUND:", ", ".join(notfound))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "docs", "REFERENCE_DIFF.md"))
    args = ap.parse_args(argv)
    return run(args.reference, args.out)


if __name__ == "__main__":
    sys.exit(main())
