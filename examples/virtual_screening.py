"""Example: fingerprint-based virtual screening on TPU.

SMILES -> Morgan fingerprints -> cross similarity against a query set ->
Butina clustering of the library. Mirrors the reference's examples/
workflow with the TPU-native API.

Run: python examples/virtual_screening.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from nvmolkit_tpu.clustering import fused_butina
from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
from nvmolkit_tpu.similarity import crossTanimotoSimilarity

LIBRARY = [
    "CC(=O)Oc1ccccc1C(=O)O",        # aspirin
    "CC(=O)Nc1ccc(O)cc1",           # paracetamol
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",   # ibuprofen
    "OC(=O)c1ccccc1O",              # salicylic acid
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",   # caffeine
    "CCOC(=O)c1ccccc1",             # ethyl benzoate
    "c1ccc2ccccc2c1",               # naphthalene
    "Oc1ccccc1",                    # phenol
]
QUERIES = ["CC(=O)Oc1ccccc1C(=O)O", "Cn1cnc2c1c(=O)n(C)c(=O)n2C"]


def main():
    gen = MorganFingerprintGenerator(radius=2, fpSize=2048)
    lib_fps = gen.GetFingerprintsFromSmiles(LIBRARY)
    query_fps = gen.GetFingerprintsFromSmiles(QUERIES)

    sim = crossTanimotoSimilarity(query_fps, lib_fps).numpy()
    for qi, q in enumerate(QUERIES):
        order = np.argsort(-sim[qi])
        print(f"\nquery {q}")
        for r in order[:3]:
            print(f"  {sim[qi, r]:.3f}  {LIBRARY[r]}")

    clusters, sizes = fused_butina(lib_fps, cutoff=0.6)
    print(f"\nButina clusters (cutoff 0.6): {len(clusters)}")
    for k, members in enumerate(clusters):
        print(f"  cluster {k}: {[LIBRARY[i] for i in members]}")


if __name__ == "__main__":
    main()
