"""Regenerate the checked-in embedding-model fixture deterministically.

Usage: python tools/train_emb_model.py [out.npz]

Trains stages/embmodel.py's 2-layer MLP (denoising-autoencoder
objective, fixed seed, pure numpy — no external data) and writes the
weights npz consumed by ERConfig.emb_model_path. The checked-in file is
tests/fixtures/emb_mlp.npz.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdmpublic_ray.stages.embmodel import train_embedding_model

out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/emb_mlp.npz"
stats = train_embedding_model(out)
print(json.dumps({"out": out, **{k: round(v, 6) if isinstance(v, float) else v
                                 for k, v in stats.items()}}))
