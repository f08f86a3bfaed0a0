"""Round-13 two-tree interleaved A/B: time the same registered queries in
TWO checkouts (e.g. working tree vs a pre-change worktree), alternating
old/new probe subprocesses so host-load bands hit both trees equally (the
r12 protocol for diffs that are not checkpoint-only).  Each probe is one
fresh Spark session running min-of-$SPARK_GRAFT_TIME_REPS noop-sink reps
per query (scripts/opt_probe.py with tag 'time', so no plan dumps).

Usage: python scripts/ab_trees.py OLD_TREE SF_DIR ROUNDS q_a [q_b ...]
Prints one JSON line {query: {"old": [mins...], "new": [mins...]}}.
"""

import json
import os
import subprocess
import sys

NEW_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(tree: str, sf_dir: str, names: list[str]) -> dict:
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(tree, "scripts", "opt_probe.py"),
            "time",
            sf_dir,
            *names,
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=tree,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])["queries"]


def main() -> None:
    old_tree, sf_dir, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    out = {n: {"old": [], "new": []} for n in names}
    for r in range(rounds):
        for tag, tree in (("old", old_tree), ("new", NEW_REPO)):
            got = probe(tree, sf_dir, names)
            for n in names:
                out[n][tag].append(got[n])
            print(f"[ab_trees] round {r} {tag}: {got}", file=sys.stderr,
                  flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
