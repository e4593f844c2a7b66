from ppmstereo_tpu.nn.common import Conv, torch_conv_kernel_init, torch_bias_init
from ppmstereo_tpu.nn.norm import InstanceNorm
