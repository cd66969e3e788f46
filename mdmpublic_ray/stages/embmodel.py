"""Learned text-embedding model for the cosine scoring signal (ST5 —
the long-lived model-holding scorer service of the reference deployment,
/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/config.xml:97-100,
re-expressed as actor-pool state).

The production contract is "cosine over a model embedding": features
carry an ``emb`` column produced by a MODEL applied to the per-doc
hashed token counts, and scoring blends per-pair cosine into the match
score. Round 3 shipped the hashed-projection embedding only; this
module adds the model:

* :class:`EmbeddingModel` — a 2-layer MLP ``l2norm(tanh(x·W1+b1)·W2+b2)``
  over the L2-normalized hashed-unigram vector
  (``blocking.hashed_embeddings_flat``). Weights are TRAINED (see
  :func:`train_embedding_model` — a denoising autoencoder objective,
  deterministic seed) and checked into ``tests/fixtures/emb_mlp.npz``;
  any npz with the same keys drops in.
* Loading is once-per-actor (``ComputeFeatures.__init__``) or
  once-per-worker (``_MODEL_CACHE``) — never per batch.
* Device selection with CPU fallback: ``device="auto"``/``"gpu"`` uses
  CuPy when importable AND the Ray cluster advertises GPUs; otherwise
  falls back to numpy with one loud warning (``_compat.warn_once``).
  A ``num_gpus`` request on a GPU-less cluster is clamped to 0 by
  :func:`resolve_num_gpus` so the stage schedules instead of hanging.

All public knowledge: MLP autoencoders and random-feature hashing are
textbook; no external weights, data, or services are involved.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "EmbeddingModel",
    "train_embedding_model",
    "resolve_num_gpus",
    "get_model",
]


def _pick_backend(device: str):
    """numpy or cupy module per the device request; loud CPU fallback."""
    if device == "cpu":
        return np, "cpu"
    want_gpu = device in ("gpu", "auto")
    if want_gpu:
        try:
            import cupy  # type: ignore

            return cupy, "gpu"
        except Exception:
            if device == "gpu":
                from .._compat import warn_once

                warn_once(
                    "emb-model-gpu",
                    "EmbeddingModel: device='gpu' requested but no usable "
                    "GPU backend (cupy) — falling back to CPU numpy. "
                    "Scoring results are identical; throughput is not.",
                )
            return np, "cpu"
    raise ValueError(f"unknown device {device!r} (cpu|gpu|auto)")


class EmbeddingModel:
    """2-layer MLP text embedder over hashed token counts.

    forward(X): ``l2norm(tanh(X @ W1 + b1) @ W2 + b2)`` — rows of X are
    the (already L2-normalized) hashed-unigram vectors the features
    stage computes; output rows are unit-norm embeddings of ``out_dim``.
    """

    def __init__(self, W1, b1, W2, b2, mu=None, *, device: str = "cpu"):
        self.xp, self.device = _pick_backend(device)
        xp = self.xp
        self.W1 = xp.asarray(W1, dtype=xp.float32)
        self.b1 = xp.asarray(b1, dtype=xp.float32)
        self.W2 = xp.asarray(W2, dtype=xp.float32)
        self.b2 = xp.asarray(b2, dtype=xp.float32)
        # learned input centering: subtracting the corpus-mean hashed
        # vector removes the shared common-token component that would
        # otherwise push ALL pairwise cosines toward 1 (the same reason
        # tf-idf down-weights stopwords)
        self.mu = (
            xp.zeros(self.W1.shape[0], dtype=xp.float32)
            if mu is None
            else xp.asarray(mu, dtype=xp.float32)
        )

    @property
    def in_dim(self) -> int:
        return int(self.W1.shape[0])

    @property
    def out_dim(self) -> int:
        return int(self.W2.shape[1])

    @classmethod
    def load(cls, path: str, *, device: str = "auto") -> "EmbeddingModel":
        """Load npz weights (keys W1,b1,W2,b2). ``device="auto"`` uses a
        GPU backend only when one is importable; never raises for a
        missing GPU."""
        with np.load(path) as z:
            mu = z["mu"] if "mu" in z.files else None
            return cls(z["W1"], z["b1"], z["W2"], z["b2"], mu, device=device)

    def __call__(self, X: np.ndarray) -> np.ndarray:
        """(n, in_dim) float → (n, out_dim) float32 unit rows (numpy,
        regardless of backend — callers write Arrow buffers)."""
        xp = self.xp
        Xd = xp.asarray(X, dtype=xp.float32) - self.mu
        h = xp.tanh(Xd @ self.W1 + self.b1)
        z = h @ self.W2 + self.b2
        norms = xp.sqrt((z * z).sum(axis=1, keepdims=True))
        norms = xp.where(norms == 0, xp.float32(1.0), norms)
        out = (z / norms).astype(xp.float32)
        if self.device == "gpu":  # cupy → host
            out = self.xp.asnumpy(out)
        return out

    def weight_digest(self) -> str:
        """Stable content digest of the weights — checkpoint params key
        (a changed model must invalidate downstream stages)."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        for a in (self.W1, self.b1, self.W2, self.b2, self.mu):
            arr = np.asarray(a) if self.device == "cpu" else self.xp.asnumpy(a)
            h.update(np.ascontiguousarray(arr, dtype=np.float32).tobytes())
        return h.hexdigest()


def model_file_digest(path: str) -> str:
    """blake2b of the model file bytes (cheap checkpoint-params key)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# per-worker model cache: loading is once per (path, device) per process,
# whether the stage runs as tasks or actors (ST1 state pattern)
_MODEL_CACHE: dict[tuple[str, str], EmbeddingModel] = {}


def get_model(path: str, *, device: str = "auto") -> EmbeddingModel:
    key = (path, device)
    m = _MODEL_CACHE.get(key)
    if m is None:
        m = EmbeddingModel.load(path, device=device)
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = m
    return m


def resolve_num_gpus(requested: float) -> float:
    """Clamp a per-actor GPU request to what the cluster has: asking for
    ``num_gpus>0`` on a GPU-less cluster makes the stage UNSCHEDULABLE
    (it hangs, it doesn't error) — degrade to 0 with one loud warning
    instead; the model falls back to its CPU backend."""
    if not requested:
        return 0.0
    try:
        import ray

        have = float(ray.cluster_resources().get("GPU", 0.0))
    except Exception:
        have = 0.0
    if have <= 0.0:
        from .._compat import warn_once

        warn_once(
            "emb-model-num-gpus",
            f"features stage: num_gpus={requested} requested but the "
            "cluster advertises 0 GPUs — scheduling on CPU (num_gpus=0) "
            "so the stage runs instead of hanging unschedulable.",
        )
        return 0.0
    return requested


def train_embedding_model(
    path: str,
    *,
    in_dim: int = 64,
    hidden: int = 48,
    out_dim: int = 32,
    seed: int = 7,
    n_docs: int = 2048,
    vocab: int = 512,
    steps: int = 1500,
    lr: float = 3.0,
) -> dict:
    """Train the checked-in model deterministically and write ``path``.

    Objective: denoising autoencoder over synthetic hashed-unigram
    vectors. Documents are drawn from a Zipf vocabulary, tokens are
    feature-hashed into ``in_dim`` signed buckets and L2-normalized —
    the exact input distribution the features stage produces — then the
    encoder (the deployed 2-layer MLP) plus a linear decoder are trained
    with full-batch gradient descent to reconstruct the CLEAN vector
    from a token-dropout view. Reconstruction forces the embedding to
    preserve the token-mixture information, so near-identical docs land
    at cosine ≈ 1 and unrelated docs stay apart — the property the
    scoring blend needs. Pure numpy, fixed seed, no external data.

    Returns {"loss_first", "loss_last", "digest"}.
    """
    rng = np.random.default_rng(seed)

    # synthetic corpus: Zipf token draws → signed-hash bucket counts
    ranks = np.arange(1, vocab + 1)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    buckets = rng.integers(0, in_dim, size=vocab)
    signs = rng.choice([-1.0, 1.0], size=vocab)

    def docs_to_x(doc_tokens: list[np.ndarray]) -> np.ndarray:
        X = np.zeros((len(doc_tokens), in_dim), dtype=np.float64)
        for i, toks in enumerate(doc_tokens):
            np.add.at(X[i], buckets[toks], signs[toks])
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return X / n

    docs = [
        rng.choice(vocab, size=rng.integers(20, 200), p=probs)
        for _ in range(n_docs)
    ]
    X_clean = docs_to_x(docs)
    # dropout view: each doc loses ~15% of its tokens
    noisy = [t[rng.random(t.size) > 0.15] for t in docs]
    X_noisy = docs_to_x([t if t.size else d[:1] for t, d in zip(noisy, docs)])
    # learned centering (see EmbeddingModel.__init__): train encoder and
    # decoder in the centered space
    mu = X_clean.mean(0)
    X_clean = X_clean - mu
    X_noisy = X_noisy - mu

    # Glorot init, fixed seed
    W1 = rng.standard_normal((in_dim, hidden)) * np.sqrt(2.0 / (in_dim + hidden))
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, out_dim)) * np.sqrt(2.0 / (hidden + out_dim))
    b2 = np.zeros(out_dim)
    W3 = rng.standard_normal((out_dim, in_dim)) * np.sqrt(2.0 / (out_dim + in_dim))
    b3 = np.zeros(in_dim)

    loss_first = loss_last = None
    n = float(n_docs)
    for step in range(steps):
        h = np.tanh(X_noisy @ W1 + b1)
        z = h @ W2 + b2
        Xh = z @ W3 + b3
        diff = Xh - X_clean
        loss = float((diff * diff).mean())
        if step == 0:
            loss_first = loss
        loss_last = loss
        # backprop (MSE; mean over all elements)
        g_Xh = 2.0 * diff / (n * in_dim)
        g_W3 = z.T @ g_Xh
        g_b3 = g_Xh.sum(0)
        g_z = g_Xh @ W3.T
        g_W2 = h.T @ g_z
        g_b2 = g_z.sum(0)
        g_h = g_z @ W2.T
        g_pre = g_h * (1.0 - h * h)
        g_W1 = X_noisy.T @ g_pre
        g_b1 = g_pre.sum(0)
        W1 -= lr * g_W1
        b1 -= lr * g_b1
        W2 -= lr * g_W2
        b2 -= lr * g_b2
        W3 -= lr * g_W3
        b3 -= lr * g_b3

    np.savez(
        path,
        W1=W1.astype(np.float32),
        b1=b1.astype(np.float32),
        W2=W2.astype(np.float32),
        b2=b2.astype(np.float32),
        mu=mu.astype(np.float32),
        meta_seed=np.array([seed]),
    )
    m = EmbeddingModel(W1, b1, W2, b2, mu)
    return {"loss_first": loss_first, "loss_last": loss_last,
            "digest": m.weight_digest()}


def default_model_path() -> str:
    """The checked-in fixture model (repo-relative), trained by
    tools/train_emb_model.py. Raises with the regeneration command if
    the file is missing."""
    import os

    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "fixtures", "emb_mlp.npz",
    )
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{p} missing — regenerate with: python tools/train_emb_model.py"
        )
    return p
