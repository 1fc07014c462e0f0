"""Compute the ECC mirror circuit's pinned vk text and diff it against
the stored golden (vk_ecc_chip.rdata), reporting the first divergence.
Host-only iteration loop for the EccChip parity work."""
import os
import sys
import difflib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("HALO2_TPU_HOST_MSM_THRESHOLD", "4096")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.curves import VESTA
from halo2_tpu.poly import Params
from halo2_tpu.plonk import keygen_vk

from test_ecc_parity import EccMirrorCircuit, GOLDEN


def main():
    params = Params.new(VESTA, 11, use_cache=False)
    vk = keygen_vk(params, EccMirrorCircuit(False))
    ours = vk.pinned_text() + "\n"
    with open("/tmp/our_vk_ecc.txt", "w") as f:
        f.write(ours)
    golden = open(os.path.join(GOLDEN, "vk_ecc_chip.rdata")).read()
    if ours == golden:
        print("MATCH: vk_ecc_chip byte-identical")
        return
    a, b = ours.splitlines(), golden.splitlines()
    n = 0
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f"line {i + 1}:")
            print(f"  ours:   {x[:200]}")
            print(f"  golden: {y[:200]}")
            n += 1
            if n >= 10:
                break
    if n == 0:
        print(f"prefix matches; length differs: ours {len(a)} lines, "
              f"golden {len(b)} lines")
        for j in range(min(len(a), len(b)), min(len(a), len(b)) + 5):
            if j < len(a):
                print("  ours+ ", a[j][:200])
            if j < len(b):
                print("  gold+ ", b[j][:200])


if __name__ == "__main__":
    main()
