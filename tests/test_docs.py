"""Docs-drift guard: every --flag the user-facing docs mention must
exist in a real parser (dynseg CLI or dynseg.serve). Documentation that
names dead flags is a silent operator trap (review r2, round 2)."""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# negative lookahead excludes hyphenated external-tool flags
# (curl's --data-binary must not register as '--data')
FLAG_RE = re.compile(r"--([a-z][a-z0-9_]*)(?![a-z0-9_-])")


def _parser_flags(parser):
    out = set()
    for a in parser._actions:
        for s in a.option_strings:
            if s.startswith("--"):
                out.add(s[2:])
    return out


def test_documented_flags_exist():
    from dynseg.cli import build_argparser

    known = _parser_flags(build_argparser())
    # serve has its own parser (python -m dynseg.serve)
    import argparse as _ap

    import dynseg.serve as serve_mod

    src = open(serve_mod.__file__).read()
    for m in re.finditer(r'add_argument\("--([a-z0-9_]+)"', src):
        known.add(m.group(1))
    # sweep/bench scripts documented in BENCHMARKS/OPERATIONS
    for script in glob.glob(os.path.join(REPO, "scripts", "*.py")):
        for m in re.finditer(r'add_argument\(\s*"--([a-z0-9_]+)"',
                             open(script).read()):
            known.add(m.group(1))

    missing = {}
    for f in glob.glob(os.path.join(REPO, "docs", "*.md")) + [
            os.path.join(REPO, "README.md")]:
        for m in FLAG_RE.finditer(open(f).read()):
            flag = m.group(1)
            if flag not in known:
                missing.setdefault(flag, os.path.basename(f))
    assert not missing, (
        f"docs reference flags no parser defines: {missing}")


def test_ema_decay_help_matches_shipped_semantics():
    """Claim-level pin (VERDICT r4 weak #1): the --ema_decay help must
    state that periodic validation / --keep_best score the RAW iterate
    (train.py Trainer._eval_impl; test_ema_eval_scores_raw_iterate) —
    the r4 science overturned the earlier 'EMA weights are scored'
    claim, and the help drifted silently."""
    from dynseg.cli import build_argparser

    action = next(a for a in build_argparser()._actions
                  if "--ema_decay" in a.option_strings)
    assert "RAW" in action.help, action.help
    # the overturned claim must be gone
    assert "they are what gets served" not in action.help
