# Learnability demonstration: PointPillars on a synthetic-but-learnable
# nuScenes-format fixture (`tools/misc/make_synthetic_nuscenes.py --classes
# car pedestrian`). Purpose: evidence that the training recipe LEARNS —
# `tools/train.py` on this config must reach internal mAP >= 0.3 on the val
# split within a few thousand steps (VERDICT r2 item 4). Mirrors the
# reference's train->eval contract (`mmdet3d/apis/train.py:180` ->
# `nuscenes_dataset.py:523`) on hardware-scale-appropriate shapes.
_base_ = ['../_base_/default_runtime.py']

point_cloud_range = [-51.2, -51.2, -5, 51.2, 51.2, 3]
class_names = ['car', 'pedestrian']
dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes_learn/'
input_modality = dict(use_lidar=True, use_camera=False, use_radar=False,
                      use_map=False, use_external=False)
max_points = 65536
voxel_size = [0.4, 0.4, 8]

model = dict(
    type='MVXFasterRCNN',
    pts_voxel_layer=dict(
        max_num_points=32,
        point_cloud_range=point_cloud_range,
        voxel_size=voxel_size,
        max_voxels=(12000, 12000)),
    pts_voxel_encoder=dict(
        type='HardVFE',
        in_channels=5,
        feat_channels=[64],
        with_distance=False,
        with_cluster_center=True,
        with_voxel_center=True,
        voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        norm_cfg=dict(type='naiveSyncBN1d', eps=1e-3, momentum=0.01)),
    pts_middle_encoder=dict(
        type='PointPillarsScatter', in_channels=64, output_shape=[256, 256]),
    pts_backbone=dict(
        type='SECOND',
        in_channels=64,
        norm_cfg=dict(type='naiveSyncBN2d', eps=1e-3, momentum=0.01),
        layer_nums=[2, 2, 2],
        layer_strides=[2, 2, 2],
        out_channels=[64, 128, 256]),
    pts_neck=dict(
        type='SECONDFPN',
        norm_cfg=dict(type='naiveSyncBN2d', eps=1e-3, momentum=0.01),
        in_channels=[64, 128, 256],
        upsample_strides=[1, 2, 4],
        out_channels=[128, 128, 128]),
    pts_bbox_head=dict(
        type='Anchor3DHead',
        num_classes=2,
        in_channels=384,
        feat_channels=384,
        use_direction_classifier=True,
        anchor_generator=dict(
            type='AlignedAnchor3DRangeGenerator',
            ranges=[
                [-51.2, -51.2, -1.80, 51.2, 51.2, -1.80],
                [-51.2, -51.2, -1.74, 51.2, 51.2, -1.74],
            ],
            sizes=[
                [1.95, 4.60, 1.72],     # car (w, l, h)
                [0.66, 0.72, 1.76],     # pedestrian
            ],
            custom_values=[0, 0],
            rotations=[0, 1.57],
            reshape_out=True),
        assigner_per_size=False,
        diff_rad_by_sin=True,
        dir_offset=0.7854,
        dir_limit_offset=0,
        bbox_coder=dict(type='DeltaXYZWLHRBBoxCoder', code_size=9),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=1.0),
        loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                      loss_weight=0.2)),
    train_cfg=dict(
        pts=dict(
            assigner=dict(
                type='MaxIoUAssigner',
                iou_calculator=dict(type='BboxOverlapsNearest3D'),
                pos_iou_thr=0.6,
                neg_iou_thr=0.3,
                min_pos_iou=0.3,
                ignore_iof_thr=-1),
            allowed_border=0,
            code_weight=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
            pos_weight=-1,
            debug=False)),
    test_cfg=dict(
        pts=dict(
            use_rotate_nms=True,
            nms_across_levels=False,
            # rotated-NMS pairwise IoU materializes O(B * nms_pre^2 * 24)
            # intersection candidates; 1000 pre-NMS boxes at batch 4 is a
            # 49 GB tensor on a 16 GB chip. 256 is plenty for <=32 GT.
            nms_pre=256,
            nms_thr=0.2,
            score_thr=0.05,
            min_bbox_size=0,
            max_num=100)))

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
    dict(type='PointShuffle'),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         max_points=max_points, max_gt=32),
    dict(type='Collect3D', keys=['points', 'gt_bboxes_3d', 'gt_labels_3d']),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         max_points=max_points, max_gt=32, with_label=False),
    dict(type='Collect3D', keys=['points']),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_train.pkl',
        pipeline=train_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=False,
        box_type_3d='LiDAR'),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=True,
        box_type_3d='LiDAR'),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file=data_root + 'nuscenes_infos_val.pkl',
        pipeline=test_pipeline,
        classes=class_names,
        modality=input_modality,
        test_mode=True,
        box_type_3d='LiDAR'))

optimizer = dict(type='AdamW', lr=1e-3, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 1e-4),
                 cyclic_times=1, step_ratio_up=0.4)
momentum_config = dict(policy='cyclic',
                       target_ratio=(0.8947368421052632, 1),
                       cyclic_times=1, step_ratio_up=0.4)
total_epochs = 100
runner = dict(type='EpochBasedRunner', max_epochs=total_epochs)
evaluation = dict(interval=20)
checkpoint_config = dict(interval=20)
log_config = dict(interval=50)
