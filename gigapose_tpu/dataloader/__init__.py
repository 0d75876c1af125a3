from gigapose_tpu.dataloader.keypoints import sample_keypoints, KeypointView
