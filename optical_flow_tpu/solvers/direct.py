"""Dense materialization of a FlowSystem + exact solve, for small grids.

This is the parity analog of the reference's ``'backslash'`` (``spsolve``)
path: exact, but only sensible for tiny systems (tests, debugging).  The
(2HW, 2HW) matrix is assembled host-side in numpy using the reference's
Fortran (column-major) unknown ordering so solutions compare 1:1.
"""
from __future__ import annotations

import numpy as np

from optical_flow_tpu.ops.stencil import FlowSystem


def dense_matrix(sys: FlowSystem) -> np.ndarray:
    """Materialize A as a dense (2HW, 2HW) numpy array (Fortran pixel order)."""
    a11 = np.asarray(sys.a11)
    H, W = a11.shape
    N = H * W

    def fidx(i, j):
        return j * H + i

    A = np.zeros((2 * N, 2 * N))
    a12 = np.asarray(sys.a12)
    a22 = np.asarray(sys.a22)
    wu_h, wu_v = np.asarray(sys.wu_h), np.asarray(sys.wu_v)
    wv_h, wv_v = np.asarray(sys.wv_h), np.asarray(sys.wv_v)

    for i in range(H):
        for j in range(W):
            p = fidx(i, j)
            A[p, p] += a11[i, j]
            A[N + p, N + p] += a22[i, j]
            A[p, N + p] += a12[i, j]
            A[N + p, p] += a12[i, j]
            # horizontal edge (i,j)-(i,j+1)
            if j < W - 1:
                q = fidx(i, j + 1)
                for off, w in ((0, wu_h[i, j]), (N, wv_h[i, j])):
                    A[off + p, off + p] += w
                    A[off + q, off + q] += w
                    A[off + p, off + q] -= w
                    A[off + q, off + p] -= w
            # vertical edge (i,j)-(i+1,j)
            if i < H - 1:
                q = fidx(i + 1, j)
                for off, w in ((0, wu_v[i, j]), (N, wv_v[i, j])):
                    A[off + p, off + p] += w
                    A[off + q, off + q] += w
                    A[off + p, off + q] -= w
                    A[off + q, off + p] -= w
    return A


def dense_solve(sys: FlowSystem) -> np.ndarray:
    """Exact solve returning the (H, W, 2) update field."""
    H, W = np.asarray(sys.a11).shape
    N = H * W
    A = dense_matrix(sys)
    b = np.concatenate(
        [np.asarray(sys.b_u).ravel(order="F"), np.asarray(sys.b_v).ravel(order="F")]
    )
    x = np.linalg.solve(A, b)
    u = x[:N].reshape((H, W), order="F")
    v = x[N:].reshape((H, W), order="F")
    return np.stack([u, v], axis=-1)
