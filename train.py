"""Training CLI (counterpart of the reference train.py).

Usage: python train.py --yaml=train [--name=... --a.b.c=value ...]
"""
import sys


def main():
    from matchnerf_tpu import config as options
    from matchnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.utils import log

    log.title(f"[{__file__}] (MatchNeRF-TPU training)")
    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.build_options(opt_cmd)
    from matchnerf_tpu.parallel import distributed
    distributed.maybe_initialize(opt)   # before run naming / any device use
    options.process_options(opt)        # hosts agree on the run directory
    log.options(opt)
    if distributed.is_main_process():
        options.save_options_file(opt)

    coach = Coach(opt)
    coach.load_dataset(["train", "val", "test"])
    coach.build_networks()
    coach.setup_optimizer()
    coach.restore_checkpoint_if_needed()
    coach.setup_visualizer()
    coach.train_model()


if __name__ == "__main__":
    main()
