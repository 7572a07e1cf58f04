"""In-kernel conservative alpha masks (ops/alpha_mask.py, r5).

Three guarantees:
  1. Conservativeness: a 0 bit implies the exact sampled alpha at ANY
     point of that barycentric cell is < threshold (so in-kernel
     rejection can never differ from the ladder's texture eval).
  2. Kernel equivalence: the masked traversal kernels + ladder produce
     exactly the unmasked ladder's results on an alpha scene
     (v7 pallas, v8 hier, v9 quarter).
  3. Instanced hit_alpha: mesh-space barycentrics + per-instance
     opacity texture resolution (r5 fix — face_obj is zeros for pools).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtimeraytracer_tpu.config import RenderConfig
from realtimeraytracer_tpu.ops.alpha_mask import (
    GRID,
    build_face_masks_np,
    pack_amask_np,
)
from realtimeraytracer_tpu.ops.texture import sample_atlas
from realtimeraytracer_tpu.scene.geometry import Material, TriangleMesh
from realtimeraytracer_tpu.scene.lights import DirectionalLight
from realtimeraytracer_tpu.scene.scene import Scene


def _random_alpha_atlas(rng, t=2, s=32):
    atlas = np.zeros((t, s, s, 4), np.float32)
    # Blocky random alpha (leaf-cutout-like): smooth enough that cells
    # have real all-transparent regions.
    for i in range(t):
        coarse = (rng.random((4, 4)) > 0.5).astype(np.float32)
        atlas[i, :, :, 3] = np.kron(coarse, np.ones((8, 8), np.float32))
    sizes = np.full((t, 2), s, np.int32)
    return atlas, sizes


class TestMaskConservative:
    def test_zero_bits_imply_transparent(self):
        rng = np.random.default_rng(7)
        atlas, sizes = _random_alpha_atlas(rng)
        f = 40
        uv0 = rng.random((f, 2)).astype(np.float32) * 2 - 0.5
        uv1 = rng.random((f, 2)).astype(np.float32) * 2 - 0.5
        uv2 = rng.random((f, 2)).astype(np.float32) * 2 - 0.5
        tex = (np.arange(f) % 3 - 1).astype(np.int32)   # some -1 (no map)
        thr = RenderConfig.alpha_threshold
        masks = build_face_masks_np(uv0, uv1, uv2, tex, atlas[..., 0],
                                    sizes, thr)
        assert (masks[tex < 0] == 0xFFFFFFFF).all()

        # Sample random barycentric points; where the mask bit is 0 the
        # exact bilinear alpha must be < threshold.
        n = 400
        u = rng.random((f, n)).astype(np.float32)
        v = rng.random((f, n)).astype(np.float32) * (1 - u)
        uv = (uv0[:, None] + u[..., None] * (uv1 - uv0)[:, None]
              + v[..., None] * (uv2 - uv0)[:, None])
        a = np.asarray(sample_atlas(
            jnp.asarray(atlas), jnp.asarray(sizes),
            jnp.asarray(np.broadcast_to(tex[:, None], (f, n))),
            jnp.asarray(uv[..., 0]), jnp.asarray(uv[..., 1])))[..., 0]
        gi = np.clip((u * GRID).astype(np.int32), 0, GRID - 1)
        gj = np.clip((v * GRID).astype(np.int32), 0, GRID - 1)
        b = gj * GRID + gi
        w = np.where(b < 32, masks[:, 0:1], masks[:, 1:2])
        bit = (w >> (b & 31)) & 1
        viol = (bit == 0) & (a >= thr) & (tex[:, None] >= 0)
        assert not viol.any(), f"{viol.sum()} non-conservative cells"
        # And the masks must not be trivially all-ones on alpha faces.
        assert (masks[tex >= 0] != 0xFFFFFFFF).any()


def _card_scene(n=6):
    """A grid of alpha-cutout cards in front of a red wall (BVH-able)."""
    rng = np.random.default_rng(3)
    scene = Scene()
    amap = np.zeros((32, 32), np.float32)
    amap[8:24, 8:24] = 1.0           # opaque square center, clear margin
    tex = scene.add_texture(amap)
    wall = TriangleMesh(
        vertices=np.array([[-9, -9, -3], [9, -9, -3], [9, 9, -3],
                           [-9, 9, -3]], np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material=Material(color=(0.9, 0.1, 0.1)))
    scene.add(wall)
    verts, faces, uvs = [], [], []
    for i in range(n):
        for k in range(n):
            cx = -6 + 12 * i / max(n - 1, 1) + rng.random() * 0.3
            cy = -6 + 12 * k / max(n - 1, 1)
            z = -1 + 0.1 * ((i + k) % 5)
            b = len(verts)
            verts += [[cx - 1, cy - 1, z], [cx + 1, cy - 1, z],
                      [cx + 1, cy + 1, z], [cx - 1, cy + 1, z]]
            faces += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
            uvs += [[0, 0], [1, 0], [1, 1], [0, 1]]
    cards = TriangleMesh(
        vertices=np.array(verts, np.float32),
        faces=np.array(faces, np.int32),
        uvs=np.array(uvs, np.float32),
        material=Material(color=(0.1, 0.8, 0.2), opacity_map=tex))
    scene.add(cards, DirectionalLight(direction=(0.2, 0.3, 1.0),
                                      color=(1, 1, 1), intensity=0.5))
    scene.camera.position = (0, 0, 8)
    scene.camera.look_at = (0, 0, 0)
    scene.camera.__post_init__()
    return scene


@pytest.mark.parametrize("backend", ["pallas", "hier", "quarter"])
class TestMaskedKernelEquivalence:
    def test_masked_equals_unmasked(self, backend):
        from realtimeraytracer_tpu.render.backends import make_backend

        scene = _card_scene()
        cfg = RenderConfig(width=16, height=16, backend=backend,
                           alpha_test=True, use_bvh=True)
        gpu = scene.compile(bvh_threshold=4)
        assert gpu.pallas_amask is not None
        masked = make_backend(gpu, cfg)
        nomask = make_backend(
            gpu._replace(pallas_amask=None, q_amask=None), cfg)

        rng = np.random.default_rng(11)
        r = 256
        # Rays from the camera side through the card field (plus some
        # grazing directions).
        o = jnp.asarray(np.tile(np.array([[0, 0, 8]], np.float32), (r, 1))
                        + rng.random((r, 3)).astype(np.float32) * 0.1)
        d = np.stack([
            rng.uniform(-0.7, 0.7, r),
            rng.uniform(-0.7, 0.7, r),
            np.full(r, -1.0),
        ], axis=1).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)

        hm = masked.closest(o, d, 1e-3, 1e4)
        hn = nomask.closest(o, d, 1e-3, 1e4)
        # Exact agreement EXCEPT rays whose transparent depth exceeds
        # alpha_rounds: there the unmasked ladder gives up and returns a
        # still-transparent hit (final alpha < threshold), while the
        # masked kernel skips in-kernel with no round bound and finds the
        # true opaque hit beyond — strictly closer to the reference's
        # unbounded any-hit semantics.
        from realtimeraytracer_tpu.render.alpha import hit_alpha

        exhausted = (np.asarray(hit_alpha(gpu, hn, o, d))
                     < cfg.alpha_threshold) & np.asarray(hn.hit)
        agree = ~exhausted
        np.testing.assert_array_equal(np.asarray(hm.prim_id)[agree],
                                      np.asarray(hn.prim_id)[agree])
        np.testing.assert_array_equal(np.asarray(hm.t)[agree],
                                      np.asarray(hn.t)[agree])
        # (>=: boundary-cell transparency still burns rounds on both
        # paths, so both ladders can exhaust identically; the masked one
        # can only ever get FURTHER.)
        assert (np.asarray(hm.t)[exhausted]
                >= np.asarray(hn.t)[exhausted]).all()
        om = np.asarray(masked.occluded(o, d, 1e-3, 20.0))
        on = np.asarray(nomask.occluded(o, d, 1e-3, 20.0))
        # Same caveat: exhausted rays may gain a real occluder.
        np.testing.assert_array_equal(om[agree], on[agree])
        assert (om[exhausted] | ~on[exhausted]).all()
        # The ladder must actually see through the transparent margins:
        # a ray through a card margin straight to the wall hits the wall.
        oc = jnp.asarray(np.array([[0.05, 0.05, 8.0]], np.float32))
        dc = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
        h1 = masked.closest(oc, dc, 1e-3, 1e4)
        assert np.asarray(h1.t)[0] < 1e4


class TestInstancedAlpha:
    def test_instanced_hit_alpha_and_ladder(self):
        from realtimeraytracer_tpu.render.backends import make_backend

        # One alpha-cutout card mesh instanced twice in front of a wall
        # mesh; rays through the transparent margin must pass through.
        scene = Scene()
        amap = np.zeros((32, 32), np.float32)
        amap[8:24, 8:24] = 1.0
        tex = scene.add_texture(amap)
        card = TriangleMesh(
            vertices=np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0],
                               [-1, 1, 0]], np.float32),
            faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
            uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
            material=Material(color=(0.1, 0.8, 0.2), opacity_map=tex))
        wall = TriangleMesh(
            vertices=np.array([[-5, -5, -3], [5, -5, -3], [5, 5, -3],
                               [-5, 5, -3]], np.float32),
            faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
            material=Material(color=(0.9, 0.1, 0.1)))
        scene.add(wall, card)
        xf = np.eye(4, dtype=np.float32)
        xf[0, 3] = 2.5
        scene.add_instances(card, [xf])
        scene.camera.position = (0, 0, 8)
        scene.camera.look_at = (0, 0, 0)
        scene.camera.__post_init__()
        gpu = scene.compile()
        assert gpu.instanced and gpu.pallas_amask is not None
        cfg = RenderConfig(width=8, height=8, backend="hier",
                           alpha_test=True)
        be = make_backend(gpu, cfg)

        o = jnp.asarray(np.array([
            [0.0, 0.0, 8.0],     # through card 0's OPAQUE center
            [0.9, 0.9, 8.0],     # through card 0's transparent margin
            [2.5, 0.0, 8.0],     # through instance 1's opaque center
            [2.5 + 0.9, 0.9, 8.0],  # instance 1's transparent margin
        ], np.float32))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1]], np.float32), (4, 1)))
        hit = be.closest(o, d, 1e-3, 1e4)
        t = np.asarray(hit.t)
        # Opaque centers stop at the cards (z=0 -> t=8); margins pass
        # through to the wall (z=-3 -> t=11).
        assert abs(t[0] - 8.0) < 1e-3 and abs(t[2] - 8.0) < 1e-3
        assert abs(t[1] - 11.0) < 1e-3 and abs(t[3] - 11.0) < 1e-3
        occ = np.asarray(be.occluded(o, d, 1e-3, 9.0))
        assert occ[0] and occ[2] and not occ[1] and not occ[3]
