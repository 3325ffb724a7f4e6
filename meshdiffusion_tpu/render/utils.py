"""Rendering math utilities (vectors, color transforms, cameras, cubemaps).

Behavioral counterpart of reference ``nvdiffrec/lib/render/util.py``
(vector ops:20-38, srgb:44-63, psnr:72-78, cubemap helpers:99-136, image
scaling:142-161, camera matrices:193-266, random poses:268-298) in pure
jax.numpy. Camera-matrix constructors are host-side numpy (tiny, static);
everything touching pixels/vertices is jnp and jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- vector ops

def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * y, -1, keepdims=True)


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2 * dot(x, n) * n - x


def length(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.sqrt(jnp.clip(dot(x, x), min=eps))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / length(x, eps)


def to_hvec(x: jnp.ndarray, w: float) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
    return jnp.pad(x, pad, constant_values=w)


# --------------------------------------------------------------- sRGB / tone

def _rgb_to_srgb(f):
    return jnp.where(f <= 0.0031308, f * 12.92,
                     jnp.power(jnp.clip(f, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055)


def rgb_to_srgb(f: jnp.ndarray) -> jnp.ndarray:
    assert f.shape[-1] in (3, 4)
    if f.shape[-1] == 4:
        return jnp.concatenate([_rgb_to_srgb(f[..., 0:3]), f[..., 3:4]], axis=-1)
    return _rgb_to_srgb(f)


def _srgb_to_rgb(f):
    return jnp.where(f <= 0.04045, f / 12.92,
                     jnp.power((jnp.clip(f, min=0.04045) + 0.055) / 1.055, 2.4))


def srgb_to_rgb(f: jnp.ndarray) -> jnp.ndarray:
    assert f.shape[-1] in (3, 4)
    if f.shape[-1] == 4:
        return jnp.concatenate([_srgb_to_rgb(f[..., 0:3]), f[..., 3:4]], axis=-1)
    return _srgb_to_rgb(f)


def reinhard(f: jnp.ndarray) -> jnp.ndarray:
    return f / (1 + f)


def mse_to_psnr(mse):
    return -10.0 / np.log(10.0) * np.log(mse)


def psnr_to_mse(psnr):
    return np.exp(-0.1 * np.log(10.0) * psnr)


# ----------------------------------------------------------------- cameras

def perspective(fovy: float = 0.7854, aspect: float = 1.0,
                n: float = 0.1, f: float = 1000.0) -> np.ndarray:
    """gluPerspective-compatible (reference util.py:193-198; note flipped y)."""
    y = np.tan(fovy / 2)
    return np.array([[1 / (y * aspect), 0, 0, 0],
                     [0, 1 / -y, 0, 0],
                     [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
                     [0, 0, -1, 0]], dtype=np.float32)


def translate(x, y, z) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


def rotate_x(a) -> np.ndarray:
    s, c = np.sin(a), np.cos(a)
    return np.array([[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]],
                    dtype=np.float32)


def rotate_y(a) -> np.ndarray:
    s, c = np.sin(a), np.cos(a)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]],
                    dtype=np.float32)


def scale(s) -> np.ndarray:
    m = np.diag([s, s, s, 1.0]).astype(np.float32)
    return m


def lookAt(eye: np.ndarray, at: np.ndarray, up: np.ndarray) -> np.ndarray:
    a = eye - at
    w = a / np.linalg.norm(a)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    tr = np.eye(4, dtype=np.float32)
    tr[:3, 3] = -eye
    rot = np.eye(4, dtype=np.float32)
    rot[0, :3], rot[1, :3], rot[2, :3] = u, v, w
    return rot @ tr


def random_rotation_translation(t: float, rng: np.random.Generator) -> np.ndarray:
    """Random rigid pose (reference util.py:268-276)."""
    m = rng.normal(size=(3, 3))
    m[1] = np.cross(m[0], m[2])
    m[2] = np.cross(m[0], m[1])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = np.zeros((4, 4), np.float32)
    out[:3, :3] = m
    out[3, 3] = 1.0
    out[:3, 3] = rng.uniform(-t, t, size=3)
    return out


# ----------------------------------------------------------------- cubemaps

def cube_to_dir(s: int, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Face-local (x, y) in [-1, 1] -> direction (reference util.py:99-106)."""
    one = jnp.ones_like(x)
    table = [
        (one, -y, -x), (-one, -y, x),
        (x, one, y), (x, -one, -y),
        (x, -y, one), (-x, -y, -one),
    ]
    rx, ry, rz = table[s]
    return jnp.stack((rx, ry, rz), axis=-1)


def _face_grid(res: Tuple[int, int]):
    gy, gx = jnp.meshgrid(
        jnp.linspace(-1.0 + 1.0 / res[0], 1.0 - 1.0 / res[0], res[0]),
        jnp.linspace(-1.0 + 1.0 / res[1], 1.0 - 1.0 / res[1], res[1]),
        indexing='ij')
    return gx, gy


def _bilinear_sample_2d(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                        wrap_u: bool = True) -> jnp.ndarray:
    """Bilinear texel fetch, uv in [0,1], align like GL (texel centers)."""
    H, W = img.shape[0], img.shape[1]
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    if wrap_u:
        x0, x1 = x0 % W, x1 % W
    else:
        x0, x1 = jnp.clip(x0, 0, W - 1), jnp.clip(x1, 0, W - 1)
    y0, y1 = jnp.clip(y0, 0, H - 1), jnp.clip(y1, 0, H - 1)
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def latlong_to_cubemap(latlong_map: jnp.ndarray, res: Tuple[int, int]
                       ) -> jnp.ndarray:
    """HDR latlong panorama -> (6, H, W, C) cubemap (reference util.py:108-121)."""
    faces = []
    gx, gy = _face_grid(res)
    for s in range(6):
        v = safe_normalize(cube_to_dir(s, gx, gy))
        tu = jnp.arctan2(v[..., 0], -v[..., 2]) / (2 * np.pi) + 0.5
        tv = jnp.arccos(jnp.clip(v[..., 1], -1, 1)) / np.pi
        faces.append(_bilinear_sample_2d(latlong_map, tu, tv, wrap_u=True))
    return jnp.stack(faces)


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap fetch for unit directions (nvdiffrast
    texture(boundary='cube') equivalent, without seam filtering).

    cubemap: (6, H, W, C); dirs: (..., 3). Face layout per cube_to_dir.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                     jnp.where(is_y, jnp.where(y > 0, 2, 3),
                               jnp.where(z > 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)

    # face-local coords inverting cube_to_dir:
    # s0 (+x): u=-z/ax, v=-y/ax   s1 (-x): u=z/ax,  v=-y/ax
    # s2 (+y): u=x/ay,  v=z/ay    s3 (-y): u=x/ay,  v=-z/ay
    # s4 (+z): u=x/az,  v=-y/az   s5 (-z): u=-x/az, v=-y/az
    u = jnp.where(is_x, jnp.where(x > 0, -z, z),
                  jnp.where(is_y, x, jnp.where(z > 0, x, -x))) / ma
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y)) / ma

    H, W = cubemap.shape[1], cubemap.shape[2]
    uu = (u * 0.5 + 0.5)
    vv = (v * 0.5 + 0.5)
    xx = jnp.clip(uu * W - 0.5, 0, W - 1)
    yy = jnp.clip(vv * H - 0.5, 0, H - 1)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = (xx - x0)[..., None]
    fy = (yy - y0)[..., None]
    a = cubemap[face, y0, x0]
    b = cubemap[face, y0, x1]
    c = cubemap[face, y1, x0]
    d = cubemap[face, y1, x1]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def cubemap_to_latlong(cubemap: jnp.ndarray, res: Tuple[int, int]) -> jnp.ndarray:
    gy, gx = jnp.meshgrid(
        jnp.linspace(0.0 + 1.0 / res[0], 1.0 - 1.0 / res[0], res[0]),
        jnp.linspace(-1.0 + 1.0 / res[1], 1.0 - 1.0 / res[1], res[1]),
        indexing='ij')
    sintheta, costheta = jnp.sin(gy * np.pi), jnp.cos(gy * np.pi)
    sinphi, cosphi = jnp.sin(gx * np.pi), jnp.cos(gx * np.pi)
    reflvec = jnp.stack(
        (sintheta * sinphi, costheta, -sintheta * cosphi), axis=-1)
    return sample_cubemap(cubemap, reflvec)


# ------------------------------------------------------------ image scaling

def avg_pool_nhwc(x: jnp.ndarray, size: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // size, size, W // size, size, C)
    return x.mean(axis=(2, 4))


def scale_img_nhwc(x: jnp.ndarray, size: Tuple[int, int],
                   mag: str = 'bilinear', min: str = 'area') -> jnp.ndarray:
    H, W = x.shape[1], x.shape[2]
    if H > size[0] and W > size[1] and min == 'area' \
            and H % size[0] == 0 and W % size[1] == 0 and H // size[0] == W // size[1]:
        return avg_pool_nhwc(x, H // size[0])
    method = 'linear' if mag in ('bilinear',) else mag
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]),
                            method=method)


def scale_img_hwc(x: jnp.ndarray, size, mag='bilinear', min='area') -> jnp.ndarray:
    return scale_img_nhwc(x[None], size, mag, min)[0]


# ------------------------------------------------------------------- images

def checkerboard(res: Tuple[int, int], checker_size: int = 8) -> np.ndarray:
    tiles_y = (res[0] + (checker_size * 2) - 1) // (checker_size * 2)
    tiles_x = (res[1] + (checker_size * 2) - 1) // (checker_size * 2)
    check = np.kron([[1, 0] * tiles_x, [0, 1] * tiles_x] * tiles_y,
                    np.ones((checker_size, checker_size))) * 0.33 + 0.33
    check = check[:res[0], :res[1]]
    return np.stack([check] * 3, axis=-1).astype(np.float32)


def save_image(path: str, img: np.ndarray) -> None:
    """PNG writer without imageio (pure-python minimal PNG)."""
    import zlib
    import struct
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    h, w, c = arr.shape
    if c == 1:
        arr = arr.repeat(3, -1)
        c = 3
    color_type = 6 if c == 4 else 2
    raw = b''.join(b'\x00' + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        out = struct.pack('>I', len(data)) + tag + data
        return out + struct.pack('>I', zlib.crc32(tag + data) & 0xffffffff)

    png = (b'\x89PNG\r\n\x1a\n'
           + chunk(b'IHDR', struct.pack('>IIBBBBB', w, h, 8, color_type, 0, 0, 0))
           + chunk(b'IDAT', zlib.compress(raw, 6))
           + chunk(b'IEND', b''))
    with open(path, 'wb') as f:
        f.write(png)


def load_image(path: str) -> np.ndarray:
    """Load PNG/HDR image as float32 HWC in [0,1] (or radiance for .hdr)."""
    if path.lower().endswith('.hdr'):
        return _load_hdr(path)
    try:
        import imageio.v2 as imageio
        img = np.asarray(imageio.imread(path))
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path))
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def _load_hdr(path: str) -> np.ndarray:
    """Minimal Radiance .hdr (RGBE) reader."""
    with open(path, 'rb') as f:
        data = f.read()
    # header
    pos = data.find(b'\n\n')
    if pos < 0:
        raise ValueError('bad hdr header')
    header, rest = data[:pos].decode('latin1'), data[pos + 2:]
    nl = rest.find(b'\n')
    dims = rest[:nl].decode('latin1').split()
    rest = rest[nl + 1:]
    assert dims[0] == '-Y' and dims[2] == '+X', dims
    h, w = int(dims[1]), int(dims[3])
    img = np.zeros((h, w, 4), np.uint8)
    ptr = 0
    for y in range(h):
        if rest[ptr] == 2 and rest[ptr + 1] == 2:  # new RLE
            ptr += 4
            row = np.zeros((4, w), np.uint8)
            for ch in range(4):
                x = 0
                while x < w:
                    n = rest[ptr]; ptr += 1
                    if n > 128:
                        row[ch, x:x + n - 128] = rest[ptr]; ptr += 1
                        x += n - 128
                    else:
                        row[ch, x:x + n] = np.frombuffer(
                            rest[ptr:ptr + n], np.uint8)
                        ptr += n
                        x += n
            img[y] = row.T
        else:  # flat
            row = np.frombuffer(rest[ptr:ptr + 4 * w], np.uint8).reshape(w, 4)
            img[y] = row
            ptr += 4 * w
    rgbe = img.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e.astype(np.int32) - 136), 0.0)
    return rgbe[..., :3] * scale[..., None]
