from ppmstereo_tpu.train.loss import sequence_loss
