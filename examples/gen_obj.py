"""Generate standard procedural OBJ models (no external assets).

The reference lists OBJ mesh support as future work
(/root/reference/README.md:22-26); BASELINE config 5 makes a mesh scene
a measurement config.  This generator produces watertight smooth
meshes at any triangle budget so the 50k-triangle benchmark needs no
network-fetched model:

  python examples/gen_obj.py --shape knot   --tris 50000 --out knot.obj
  python examples/gen_obj.py --shape sphere --tris 20000 --out ball.obj

Shapes: ``knot`` (p=2,q=3 torus knot — long, curved, self-occluding:
a good BVH/cull stress), ``sphere`` (UV sphere), ``torus``.
"""

from __future__ import annotations

import argparse

import numpy as np


def _grid_faces(nu: int, nv: int, wrap_u: bool = True, wrap_v: bool = True):
    """Quad-grid triangulation over a (nu, nv) vertex grid."""
    faces = []
    last_u = nu if wrap_u else nu - 1
    last_v = nv if wrap_v else nv - 1
    for i in range(last_u):
        for j in range(last_v):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append((a, b, c))
            faces.append((a, c, d))
    return np.asarray(faces, np.int64)


def torus_knot(tris: int, p: int = 2, q: int = 3, radius: float = 1.0,
               tube: float = 0.35):
    """(vertices, faces) of a (p,q) torus knot tube with ~tris triangles."""
    # tris = 2 * nu * nv; keep the tube ring at ~1/4 the path samples.
    nv = max(8, int(round(np.sqrt(tris / 8.0))))
    nu = max(16, -(-tris // (2 * nv)))
    t = np.linspace(0.0, 2.0 * np.pi, nu, endpoint=False)
    r = radius * (2.0 + np.cos(q * t)) / 3.0
    path = np.stack([r * np.cos(p * t), r * np.sin(p * t),
                     radius * np.sin(q * t) / 3.0], axis=-1)
    # Frenet-ish frame from finite differences (stable enough for a
    # smooth knot; re-orthonormalized per sample).
    tan = np.roll(path, -1, axis=0) - np.roll(path, 1, axis=0)
    tan /= np.linalg.norm(tan, axis=-1, keepdims=True)
    ref = np.array([0.0, 0.0, 1.0])
    nrm = np.cross(tan, ref)
    bad = np.linalg.norm(nrm, axis=-1) < 1e-6
    nrm[bad] = np.cross(tan[bad], np.array([0.0, 1.0, 0.0]))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    bin_ = np.cross(tan, nrm)
    theta = np.linspace(0.0, 2.0 * np.pi, nv, endpoint=False)
    ring = (np.cos(theta)[:, None, None] * nrm[None]
            + np.sin(theta)[:, None, None] * bin_[None])  # (nv, nu, 3)
    verts = (path[None] + tube * ring).transpose(1, 0, 2).reshape(-1, 3)
    return verts, _grid_faces(nu, nv)


def uv_sphere(tris: int, radius: float = 1.0):
    nv = max(8, int(round(np.sqrt(tris / 2.0))))
    nu = max(8, -(-tris // (2 * nv)))
    phi = np.linspace(0.0, np.pi, nu + 1)[1:-1]  # poles handled as rings
    theta = np.linspace(0.0, 2.0 * np.pi, nv, endpoint=False)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    verts = radius * np.stack([
        np.sin(pp) * np.cos(tt), np.cos(pp), np.sin(pp) * np.sin(tt)
    ], axis=-1).reshape(-1, 3)
    faces = _grid_faces(nu - 1, nv, wrap_u=False, wrap_v=True)
    return verts, faces


def torus(tris: int, radius: float = 1.0, tube: float = 0.4):
    nv = max(8, int(round(np.sqrt(tris / 2.0))))
    nu = max(8, -(-tris // (2 * nv)))
    u = np.linspace(0.0, 2.0 * np.pi, nu, endpoint=False)
    v = np.linspace(0.0, 2.0 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack([
        (radius + tube * np.cos(vv)) * np.cos(uu),
        tube * np.sin(vv),
        (radius + tube * np.cos(vv)) * np.sin(uu),
    ], axis=-1).reshape(-1, 3)
    return verts, _grid_faces(nu, nv)


SHAPES = {"knot": torus_knot, "sphere": uv_sphere, "torus": torus}


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray,
              name: str = "model") -> None:
    with open(path, "w") as f:
        f.write(f"o {name}\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {a} {b} {c}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=sorted(SHAPES), default="knot")
    ap.add_argument("--tris", type=int, default=50_000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    verts, faces = SHAPES[args.shape](args.tris)
    write_obj(args.out, verts, faces, name=args.shape)
    print(f"wrote {args.out}: {len(verts)} vertices, {len(faces)} triangles")


if __name__ == "__main__":
    main()
