from ppmstereo_tpu.nn.vda.video_depth import VideoDepthAnything, DepthExtractor
