"""Round-notes evidence audit.

The round-4 verdict's #1 finding: ROUND4_NOTES.md claimed artifacts
("committed at the snapshot commit") that never made it into git —
a forgotten `git add` is indistinguishable from fabricated work to a
reviewer. This test industrializes the audit: every artifact filename
cited in the current round's notes MUST be tracked by git. It runs in
the normal suite, so a notes file citing a phantom artifact turns the
suite red before the snapshot can claim it green.
"""

import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Filenames that look like committed artifacts: round-stamped logs/JSONs
# referenced anywhere in the notes body (backticked or bare).
_ARTIFACT_RE = re.compile(
    r"[\w/.-]*(?:SUITE|TPU_TESTS|RESULTS|LOADTEST|ROOFLINE|WEAK_SCALING|"
    r"BENCH|MULTICHIP)_r\d+(?:[\w.-]*)\.(?:txt|json)")


def _latest_notes():
    notes = sorted(REPO.glob("ROUND*_NOTES.md"),
                   key=lambda p: int(re.search(r"\d+", p.name).group()))
    return notes[-1] if notes else None


def test_cited_artifacts_exist_in_git():
    notes = _latest_notes()
    if notes is None:
        return  # round 1: no notes yet
    tracked = set(subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True,
        text=True, check=True).stdout.split())
    body = notes.read_text()
    cited = set(_ARTIFACT_RE.findall(body))
    # "(filled at snapshot)" sections may cite artifacts produced by the
    # end-of-round driver itself (BENCH_r/MULTICHIP_r of the CURRENT
    # round) — those cannot exist before the driver runs; exempt them.
    this_round = int(re.search(r"\d+", notes.name).group())
    exempt = {f"BENCH_r{this_round:02d}.json",
              f"MULTICHIP_r{this_round:02d}.json",
              # the full-suite log of the CURRENT round is produced by
              # the very pytest run this test is part of — it is
              # committed immediately after that run, so it cannot be
              # tracked while the run executes
              f"SUITE_r{this_round}.txt"}
    missing = []
    for name in sorted(cited):
        if Path(name).name in exempt:
            continue
        # cited either repo-relative or bare; accept a basename match of
        # a tracked file to tolerate "benchmarks/X" vs "X" citation style
        if name in tracked:
            continue
        if any(t.endswith("/" + name) or Path(t).name == Path(name).name
               for t in tracked):
            continue
        missing.append(name)
    assert not missing, (
        f"{notes.name} cites artifacts not tracked by git: {missing} — "
        "commit them (or fix the notes) before snapshot")
