"""Evaluation / video-rendering CLI (counterpart of the reference test.py).

Usage: python test.py --yaml=test [--nerf.render_video --data_test.dtu.max_len=2 ...]
"""
import sys


def main():
    from matchnerf_tpu import config as options
    from matchnerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.utils import log

    log.title(f"[{__file__}] (MatchNeRF-TPU evaluation)")
    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.build_options(opt_cmd)
    from matchnerf_tpu.parallel import distributed
    distributed.maybe_initialize(opt)   # before run naming / any device use
    options.process_options(opt)        # hosts agree on the run directory
    log.options(opt)
    if distributed.is_main_process():
        options.save_options_file(opt)

    coach = Coach(opt)
    coach.load_dataset(["test"])
    coach.build_networks()
    coach.restore_checkpoint_if_needed()
    coach.setup_eval_parallel()
    if opt.nerf.get("render_video"):
        coach.test_model_video()
    else:
        coach.test_model(save_images=True, separate_save=bool(opt.get("separate_save")))


if __name__ == "__main__":
    main()
