from . import composite, distortion, hash_encoder, marching, math, rays, sh, triplane  # noqa: F401
