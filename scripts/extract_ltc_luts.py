"""Extract the public LTC lookup tables into .npy assets.

The LTC (Linearly Transformed Cosines) tables are third-party public data
(originating from Heitz et al. 2016, distributed via learnopengl.com); the
reference vendors them as a C header of float literals
(/root/reference/external/LUT/ltc_matrix.h, see also
/root/reference/src/app/setup/create_scene.cppm:162-214 which uploads them as
two 64x64 RGBA32F textures).  We ship them as .npy arrays of shape (64, 64, 4):

  ltc_1.npy — inverse-M matrix parameters (a, b, c, d) such that
              Minv = [[a,0,b],[0,1,0],[c,0,d]]
  ltc_2.npy — (GGX norm, Fresnel weight, unused, horizon-clip form factor)

Indexing convention: table[v, u, c] where u ~ roughness, v ~ sqrt(1-cos_theta)
(matching GL texture(u,v) row-major-by-row layout).
"""

import re
import sys

import numpy as np

SRC = "/root/reference/external/LUT/ltc_matrix.h"
OUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "assets"


def main() -> None:
    text = open(SRC).read()
    tables = {}
    for name in ("LTC1", "LTC2"):
        m = re.search(rf"const float {name}\[\]\s*=\s*\{{(.*?)\}};", text, re.S)
        if not m:
            raise SystemExit(f"table {name} not found in {SRC}")
        vals = np.array(
            [float(x) for x in re.findall(r"[-+0-9.eE]+", m.group(1))],
            dtype=np.float32,
        )
        if vals.size != 64 * 64 * 4:
            raise SystemExit(f"{name}: expected {64*64*4} floats, got {vals.size}")
        tables[name] = vals.reshape(64, 64, 4)
    np.save(f"{OUT_DIR}/ltc_1.npy", tables["LTC1"])
    np.save(f"{OUT_DIR}/ltc_2.npy", tables["LTC2"])
    print("wrote", f"{OUT_DIR}/ltc_1.npy", f"{OUT_DIR}/ltc_2.npy")


if __name__ == "__main__":
    main()
