from ppmstereo_tpu.models.ppm_stereo import PPMStereo, PPMStereoConfig
