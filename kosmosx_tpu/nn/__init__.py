from kosmosx_tpu.nn import layers, xpos, attention, multiway, decoder, resampler, vision
