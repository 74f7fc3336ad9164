# CPU-sized learnability demonstration: same recipe as
# hv_pointpillars_learnability_syn.py (PointPillars on the synthetic-but-
# learnable nuScenes-format fixture) shrunk so `tools/train.py` converges
# on a single CPU core in <1 h — fallback evidence for the train->eval
# contract when no accelerator is reachable. Inherits everything and
# overrides sizes only.
_base_ = ['./hv_pointpillars_learnability_syn.py']

max_points = 16384
voxel_size = [0.8, 0.8, 8]

model = dict(
    pts_voxel_layer=dict(voxel_size=voxel_size, max_voxels=(4000, 4000)),
    pts_voxel_encoder=dict(feat_channels=[32], voxel_size=voxel_size),
    pts_middle_encoder=dict(in_channels=32, output_shape=[128, 128]),
    pts_backbone=dict(
        in_channels=32, layer_nums=[2, 2], layer_strides=[2, 2],
        out_channels=[48, 96]),
    pts_neck=dict(in_channels=[48, 96], upsample_strides=[1, 2],
                  out_channels=[64, 64]),
    pts_bbox_head=dict(in_channels=128, feat_channels=128),
    test_cfg=dict(pts=dict(nms_pre=128, max_num=64)))

data = dict(samples_per_gpu=4, workers_per_gpu=2)

train_pipeline_override = None  # pipeline inherited; only points cap shrinks
# note: DefaultFormatBundle3D max_points is set in the base pipeline; the
# override below rebuilds the two pipeline entries that carry sizes.
point_cloud_range = [-51.2, -51.2, -5, 51.2, 51.2, 3]
class_names = ['car', 'pedestrian']
train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05], translation_std=[0, 0, 0]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='PointSample', num_points=max_points),
    dict(type='PointShuffle'),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         max_points=max_points, max_gt=32),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointSample', num_points=max_points),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         max_points=max_points, max_gt=32, with_label=False),
    dict(type='Collect3D', keys=['points']),
]
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline))

total_epochs = 60
runner = dict(type='EpochBasedRunner', max_epochs=total_epochs)
evaluation = dict(interval=15)
checkpoint_config = dict(interval=15)
