from humanrf_tpu.parallel.mesh import make_mesh, make_sharded_train_step
