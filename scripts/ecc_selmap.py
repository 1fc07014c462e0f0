"""Print the selector -> compressed-column map for the ECC mirror
circuit plus each selector's enable-row footprint, to correlate the
mismatching compressed columns with region types."""
import os
import sys
from types import SimpleNamespace
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from test_ecc_parity import EccMirrorCircuit

from halo2_tpu.fields import FP
from halo2_tpu.plonk.circuit import ConstraintSystem
from halo2_tpu.plonk.keygen import Assembly
from halo2_tpu.plonk.compress_selectors import compress_selectors
from halo2_tpu.circuit import synthesize_circuit

K = 11
N = 1 << K

cs = ConstraintSystem()
circuit = EccMirrorCircuit(False)
config = type(circuit).configure(cs)
params = SimpleNamespace(n=N, k=K)
assembly = Assembly(cs, params, FP)
synthesize_circuit(assembly, circuit, config, cs.constants)

# selector index -> human name, from config (best-effort)
names = {}
for attr in dir(config):
    v = getattr(config, attr)
    if hasattr(v, "index") and type(v).__name__ == "Selector":
        names[v.index] = attr
for sub in ("lookup_config",):
    c2 = getattr(config, sub, None)
    if c2 is not None:
        for attr in dir(c2):
            v = getattr(c2, attr)
            if hasattr(v, "index") and type(v).__name__ == "Selector":
                names[v.index] = f"{sub}.{attr}"

acts = [list(a) for a in assembly.selectors]
cs2, polys = compress_selectors(cs, assembly.selectors)
for i, col in enumerate(cs2.selector_map):
    rows = [r for r, b in enumerate(acts[i]) if b]
    span = (rows[0], rows[-1], len(rows)) if rows else None
    print(f"sel {i:2d} ({names.get(i, '?'):30s}) -> col {col.index:2d}  "
          f"rows {span}")
