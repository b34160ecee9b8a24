"""Train-step timing micro-bench for backward-flag A/Bs.

Times the vanilla train step (fwd + Pallas bwd + grad reduce + Adam) at
the bench_all shape (512px / 100k gaussians) under the current env flags
and prints one line. Used by the sweep to time GS_BWD_DOT3 etc., which
the parity-only grad check cannot.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    from bench_all import bench_train_step

    ms = bench_train_step()
    flags = {k: v for k, v in os.environ.items() if k.startswith("GS_")}
    print(f"train_ms_it={ms:.2f} flags={flags}", flush=True)


if __name__ == "__main__":
    main()
