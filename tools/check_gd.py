#!/usr/bin/env python3
"""Numpy reference for ml_train_logreg_gd (SURVEY §5.3#3).

Recomputes the 10-step full-batch logistic GD (lr=0.1, w0=0,
y=label%2) on the embeddings fixture and compares against the engine's
emitted weights parquet. Dev-only cross-check; the equivalent Scala
sequential reference runs in NoOracleSpec.

Usage: python3 tools/check_gd.py <sfDir> <verifyOutDir>
"""
import sys

import numpy as np
import pandas as pd


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    y = (emb.label.to_numpy() % 2).astype(np.float64)
    n, dims = X.shape
    w = np.zeros(dims)
    losses = []
    for _ in range(10):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        losses.append(-np.mean(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12)))
        w -= 0.1 * (X.T @ (p - y)) / n
    p = 1.0 / (1.0 + np.exp(-X @ w))
    losses.append(-np.mean(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12)))
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), "loss not decreasing"

    got = pd.read_parquet(f"{out_dir}/ml_train_logreg_gd").sort_values("dim")
    diff = np.abs(got.weight.to_numpy() - np.round(w, 6)).max()
    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f} (monotone ok); max |dw| = {diff:.2e}")
    assert diff < 2e-6, "distributed weights diverge from numpy reference"
    print("OK")


if __name__ == "__main__":
    main()
