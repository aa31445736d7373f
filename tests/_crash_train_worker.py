"""Training worker for the crash-resume test (spawned by
test_crash_resume.py): runs the condition train CLI on CPU and, when
crash_at_step > 0, SIGKILLs its own process right before executing train
step crash_at_step+1 — a real kill -9 mid-epoch, after earlier epochs'
checkpoints have been async-published.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    crash_at = int(sys.argv[1])  # 0 = run to completion
    argv = sys.argv[2:]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    if crash_at:
        import signal

        from textreact_tpu.train import trainer as trainer_mod

        real = trainer_mod.make_train_step
        count = {"n": 0}

        def wrapped(*a, **kw):
            step = real(*a, **kw)

            def counting(state, batch, rng):
                count["n"] += 1
                if count["n"] > crash_at:
                    os.kill(os.getpid(), signal.SIGKILL)  # no cleanup, no atexit
                return step(state, batch, rng)

            return counting

        trainer_mod.make_train_step = wrapped

    from textreact_tpu.cli.main import main as train_main

    train_main(argv)


if __name__ == "__main__":
    main()
