"""Unified CLI (replaces the reference's four standalone argparse scripts).

    python -m tempme_tpu.cli learn-base  --data uslegis_sampled --base_type tgn
    python -m tempme_tpu.cli preprocess  --data uslegis_sampled
    python -m tempme_tpu.cli explain     --data uslegis_sampled --base_type tgn
    python -m tempme_tpu.cli enhance     --data uslegis_sampled --base_type tgn
    python -m tempme_tpu.cli pipeline    --data uslegis_sampled --base_type tgn
    python -m tempme_tpu.cli sample-dataset --data enron --ratio 0.15
    python -m tempme_tpu.cli analyze     --data uslegis_sampled
    python -m tempme_tpu.cli node-degrees --data uslegis_sampled
    python -m tempme_tpu.cli visualize   --data uslegis_sampled --base_type tgn
    python -m tempme_tpu.cli validate    --data uslegis_sampled
    python -m tempme_tpu.cli supervise   --stall_timeout 600 -- python -m ...
    python -m tempme_tpu.cli profile     --data uslegis_sampled
    python -m tempme_tpu.cli smoke
    python -m tempme_tpu.cli scaling-report
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "learn-base":
        from .train.learn_base import main as m
        return m(rest)
    if cmd == "preprocess":
        from .train.preprocess import main as m
        return m(rest)
    if cmd == "explain":
        from .train.temp_exp_main import main as m
        return m(rest)
    if cmd == "enhance":
        from .train.enhance_main import main as m
        return m(rest)
    if cmd == "pipeline":
        from .train.batch_train import main as m
        return m(rest)
    if cmd in ("sample-dataset", "analyze"):
        from .train.sample_tools import main as m
        return m([cmd] + rest)
    if cmd == "node-degrees":
        from .tools.node_degrees import main as m
        return m(rest)
    if cmd == "visualize":
        from .tools.visualize import main as m
        return m(rest)
    if cmd == "validate":
        from .tools.validate import main as m
        return m(rest)
    if cmd == "supervise":
        from .tools.supervise import main as m
        return m(rest)
    if cmd == "profile":
        from .tools.profile_step import main as m
        return m(rest)
    if cmd == "smoke":
        from .tools.tpu_smoke import main as m
        return m()
    if cmd == "scaling-report":
        from .tools.scaling_report import main as m
        return m(rest)
    print(f"unknown command {cmd!r}\n{__doc__}")
    return 1


if __name__ == "__main__":
    sys.exit(main() or 0)
