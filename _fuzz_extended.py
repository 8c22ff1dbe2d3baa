"""One-off extended fuzz campaign (untracked): many more trials of the
seeded property tests, plus wider seeds for the face-topology fuzz."""
import sys, traceback
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from tests.test_fuzz_ops import (
    test_random_op_matches_oracle,
    test_random_cumsum_matches_oracle,
)
from tests.test_fuzz_faces import (
    test_fuzz_cubed_sphere_dispatch,
    test_fuzz_cubed_sphere_vector_dispatch,
    test_fuzz_llc_dispatch,
)

fails = []
def run(fn, arg):
    try:
        fn(arg)
    except Exception:
        fails.append((fn.__name__, arg, traceback.format_exc()))
        print(f"FAIL {fn.__name__}({arg})", flush=True)

start, n = int(sys.argv[1]), int(sys.argv[2])
for t in range(start, start + n):
    run(test_random_op_matches_oracle, t)
    if t % 50 == 0:
        print(f"ops trial {t} done", flush=True)
for t in range(start, start + n // 2):
    run(test_random_cumsum_matches_oracle, t)
print("cumsum done", flush=True)
for s in range(start, start + n // 10):
    run(test_fuzz_cubed_sphere_dispatch, s)
    run(test_fuzz_cubed_sphere_vector_dispatch, s)
    run(test_fuzz_llc_dispatch, s)
print(f"faces done; total failures: {len(fails)}", flush=True)
for name, arg, tb in fails[:5]:
    print("=" * 60, f"\n{name}({arg})\n", tb[-1500:], flush=True)
