"""CLI training entry point (the reference's `th main.lua`, main.lua:17-39).

    python main.py --dataset Kitti2015 --optimize pme --pme_criterion OBGCC \
                   --past_flow 1 --batchSize 8 --nEpochs 1000

Every reference flag is exposed 1:1 (config.Options / opts.lua:14-160);
stdout is teed to `<save>/log` (myCmdLine.lua:191-221).
"""

from __future__ import annotations

import sys

from back2future_tpu.config import parse_args
from back2future_tpu.train.loop import run
from back2future_tpu.utils import TeeLogger, enable_compile_cache


def main(argv=None) -> None:
    opt = parse_args(argv)
    if opt.platform:
        # Must land before the first backend touch. An env JAX_PLATFORMS
        # is shadowed by sitecustomize-registered plugins; the config
        # update is not (see CLAUDE.md) — this makes `--platform cpu`
        # work for CPU-hermetic subprocess tests of the CLI.
        import jax

        jax.config.update("jax_platforms", opt.platform)
    enable_compile_cache()
    with TeeLogger(f"{opt.save}/log"):
        print(opt.to_json())
        run(opt)


if __name__ == "__main__":
    main(sys.argv[1:])
