"""VBench score aggregation CLI (reference ``calc_finnal_score.py``; the
normalization constants are shipped in-repo, fixing its missing import)."""

from __future__ import annotations

import argparse
import json

from blade.evalsuite.aggregate import final_scores, format_table, load_results_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_dir", required=True,
                   help="dir with *_eval_results.json (VBench output)")
    p.add_argument("--json", action="store_true", help="machine-readable out")
    args = p.parse_args()
    raw = load_results_dir(args.result_dir)
    if args.json:
        print(json.dumps({"raw": raw, "final": final_scores(raw)}))
    else:
        print(format_table(raw))


if __name__ == "__main__":
    main()
