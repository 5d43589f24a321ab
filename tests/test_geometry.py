"""Geometry: quaternions, pose chain, frustum projection round-trip,
grid_sample vs torch, depth z-buffer vs numpy reference."""
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu import geometry as geo
from fusionocc_tpu.ops.grid_sample import (grid_sample_2d, resize_bilinear,
                                           resize_trilinear)


def test_quat_identity_and_known_rotation():
    np.testing.assert_allclose(geo.quat_to_mat([1, 0, 0, 0]), np.eye(3))
    # 90 deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = geo.quat_to_mat(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_sensor2keyego_chain_round_trip():
    rng = np.random.RandomState(0)

    def rand_pose():
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        return geo.pose_matrix(q, rng.randn(3) * 1000.0)

    F, N = 2, 3
    s2e = np.stack([np.stack([rand_pose() for _ in range(N)]) for _ in range(F)])
    e2g = np.stack([np.stack([rand_pose() for _ in range(N)]) for _ in range(F)])
    out = geo.sensor2keyego_chain(s2e, e2g)
    # frame 0 / cam 0: key ego == its own ego => chain == its sensor2ego
    np.testing.assert_allclose(out[0, 0], s2e[0, 0], atol=1e-4)
    # check one arbitrary entry against fp64 direct computation
    expect = np.linalg.inv(e2g[0, 0]) @ e2g[1, 2] @ s2e[1, 2]
    np.testing.assert_allclose(out[1, 2], expect.astype(np.float32), atol=1e-4)


def test_frustum_projection_round_trip():
    """Project the frustum to ego, then re-project into the camera: must
    recover the original pixel/depth (inverse consistency)."""
    rng = np.random.RandomState(0)
    frustum = geo.make_frustum((1.0, 5.0, 1.0), (16, 32), 4)
    B, N = 1, 2
    intr = np.tile(np.array([[25.0, 0, 16], [0, 25.0, 8], [0, 0, 1]],
                            np.float32), (B, N, 1, 1))
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    s2e[..., :3, 3] = rng.uniform(-1, 1, (B, N, 3))
    post_rot = np.tile(np.diag([0.5, 0.5, 1.0]).astype(np.float32),
                       (B, N, 1, 1))
    post_tran = np.zeros((B, N, 3), np.float32)
    post_tran[..., :2] = rng.uniform(-2, 2, (B, N, 2))
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))

    pts = geo.frustum_to_ego(frustum, jnp.asarray(s2e), jnp.asarray(intr),
                             jnp.asarray(post_rot), jnp.asarray(post_tran),
                             jnp.asarray(bda))
    pts = np.asarray(pts)
    for n in range(N):
        cam = (np.linalg.inv(s2e[0, n])[:3, :3] @
               pts[0, n].reshape(-1, 3).T +
               np.linalg.inv(s2e[0, n])[:3, 3:4])
        img = intr[0, n] @ cam
        uv = img[:2] / img[2]
        uvd = np.concatenate([uv, img[2:3]], axis=0)
        uvd_aug = post_rot[0, n] @ uvd + post_tran[0, n][:, None]
        ref = np.asarray(frustum).reshape(-1, 3).T
        np.testing.assert_allclose(uvd_aug, ref, atol=1e-3)


def test_mlp_input_shape_and_values():
    B, N = 2, 3
    rng = np.random.RandomState(0)
    s2k = jnp.asarray(rng.randn(B, N, 4, 4), jnp.float32)
    intrin = jnp.asarray(rng.randn(B, N, 3, 3), jnp.float32)
    pr = jnp.asarray(rng.randn(B, N, 3, 3), jnp.float32)
    pt = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    bda = jnp.asarray(rng.randn(B, 3, 3), jnp.float32)
    out = geo.get_mlp_input(s2k, intrin, pr, pt, bda)
    assert out.shape == (B, N, 27)
    np.testing.assert_allclose(out[1, 2, 0], intrin[1, 2, 0, 0])
    np.testing.assert_allclose(np.asarray(out[0, 1, 15:27]),
                               np.asarray(s2k[0, 1, :3, :]).reshape(-1))


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 5, 7).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 4, 6, 2)).astype(np.float32)
    for ac in [True, False]:
        ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                            mode='bilinear', padding_mode='zeros',
                            align_corners=ac).numpy()
        got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                        align_corners=ac))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 6, 8).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(img), scale_factor=2,
                        mode='bilinear', align_corners=True).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(img), (12, 16)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_trilinear_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 3, 4, 5).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode='trilinear', align_corners=True).numpy()
    got = np.asarray(resize_trilinear(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_points_to_depthmap_zbuffer():
    pts = jnp.asarray([
        [2.2, 1.1, 5.0],
        [2.4, 1.2, 3.0],   # same pixel (2,1), closer -> wins
        [0.0, 0.0, 60.0],  # out of depth range
        [-1.0, 2.0, 4.0],  # out of image
        [3.0, 0.0, 7.0],
    ], jnp.float32)
    valid = jnp.asarray([True, True, True, True, False])
    out = np.asarray(geo.points_to_depthmap(pts, valid, 4, 6, (1.0, 45.0)))
    assert out[1, 2] == 3.0
    assert out[0, 3] == 0.0  # masked-out point
    assert out.sum() == 3.0
