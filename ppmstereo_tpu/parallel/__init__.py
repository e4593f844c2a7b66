from ppmstereo_tpu.parallel.mesh import MeshSpec, make_mesh
from ppmstereo_tpu.parallel.sharding import batch_sharding, replicate
