# IS-Fusion flagship (nuScenes, 0.075 m voxels) — key-compatible with the
# reference `configs/isfusion/isfusion_0075voxel.py`.
class_names = [
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone'
]

voxel_size = [0.075, 0.075, 0.2]
point_cloud_range = [-54, -54, -5, 54, 54, 3]
img_scale = (384, 1056)

total_epochs = 10

out_size_factor = 8
voxel_shape = int((point_cloud_range[3] - point_cloud_range[0])
                  // voxel_size[0])                      # 1440
bev_size = voxel_shape // out_size_factor                # 180
grid_size = [[bev_size, bev_size, 1], [bev_size // 2, bev_size // 2, 1]]
region_shape = [(6, 6, 1), (6, 6, 1)]
region_drop_info = [
    {0: {'max_tokens': 36, 'drop_range': (0, 100000)}},
    {0: {'max_tokens': 36, 'drop_range': (0, 100000)}},
]

# Fixed capacities for the static-shape TPU pipeline (the reference's
# max_voxels=(-1,-1) dynamic voxelization keeps all voxels; SURVEY.md §7
# design decision 2 covers the bounded-drop contract). Quantified at
# bench density (250k-point ray-cast cloud, 0.075 m voxels): 156,444
# in-range voxels. The r1-r4 cap of 120k kept only 76.7% of them — and
# because the drop order is ascending linear id (z-major), it truncated
# the scene at z = -0.6 m, losing everything above wholesale. 160k keeps
# 100.0% at bench density (r5 census, PERF.md). Encoder cost does NOT
# scale with this cap — it scales with the COLUMN caps below, which are
# sized to the measured column tables independently.
max_points = 250000          # padded point budget (10 sweeps)
max_voxels = (160000, 160000)
# active 0.6 m pillars measured 15,340 of 32,400 cells at bench density;
# 20k (30% margin) vs the old 30k trims the pillarize + P2G gather cost
pillar_max_voxels = (20000, 20000)

model = dict(
    type='ISFusionDetector',

    detach=True,
    pc_range=point_cloud_range,
    voxel_size=voxel_size,
    out_size_factor=out_size_factor,
    pillar_max_voxels=pillar_max_voxels,

    # bfloat16 compute with float32 master params across the model
    # (TPU-first policy replacing the reference's auto_fp16 decorators;
    # geometry — voxelization, VFE centers, box decode, Hungarian costs,
    # softmax/norm statistics — stays float32, see models/layers.py
    # resolve_dtype)
    img_backbone=dict(
        type='SwinTransformer',
        compute_dtype='bfloat16',
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        mlp_ratio=4,
        qkv_bias=True,
        qk_scale=None,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        drop_path_rate=0.2,
        patch_norm=True,
        out_indices=[1, 2, 3],
        with_cp=True,   # remat Swin blocks: 6x(384x1056) training memory
        convert_weights=False),
    img_neck=dict(
        type='GeneralizedLSSFPN',
        compute_dtype='bfloat16',
        in_channels=[192, 384, 768],
        out_channels=256,
        start_level=0,
        num_outs=3),

    pts_voxel_layer=dict(
        point_cloud_range=point_cloud_range,
        max_num_points=-1, voxel_size=voxel_size, max_voxels=max_voxels),
    pts_voxel_encoder=dict(
        type='DynamicVFE',
        in_channels=5,
        feat_channels=[64, 64],
        with_distance=False,
        voxel_size=voxel_size,
        with_cluster_center=True,
        with_voxel_center=True,
        point_cloud_range=point_cloud_range,
        norm_cfg=dict(type='naiveSyncBN1d', eps=1e-3, momentum=0.01)),
    pts_middle_encoder=dict(
        type='SparseEncoder',
        in_channels=64,
        sparse_shape=[41, voxel_shape, voxel_shape],
        base_channels=32,
        output_channels=256,
        order=('conv', 'norm', 'act'),
        encoder_channels=((32, 32, 64), (64, 64, 128), (128, 128, 256),
                          (256, 256)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, [0, 1, 1]), (0, 0)),
        block_type='basicblock',
        # Column capacities per stage table (x v_cap=160k). Exact
        # uncapped column counts at bench density (r5 host walk):
        # 123,119 / 108,536 / 55,536 / 22,193 — these ratios give caps
        # (128000, 114400, 58000, 23200), i.e. every real column with
        # 4-5% margin. (The r4 config's 0.9x120k=108k stage-0 cap only
        # sufficed because the 120k VOXEL cap had already cut the scene.)
        stage_cap_ratios=(0.80, 0.715, 0.3625, 0.145),
        # Per-stage x-dilated-table capacities (x the column caps above).
        # The TRUE dilation factor falls with depth — measured 2.00 /
        # 1.51 / 1.30 at stages 0/1/2 (r5 host walk: 246,041 / 164,149 /
        # 72,268 dilated columns) — and every subm conv's cost is
        # proportional to its dilated table, so the r4 global 2.0 wasted
        # ~26% of stage-1 conv work on empty slots. Drop-free at bench
        # density with 4-8% margin: EXACTNESS first, like the 160k voxel
        # cap above (the reference drops nothing).
        dilation_ratio=2.0,
        dilation_ratios=(2.0, 1.55, 1.4, 1.4),
        # REFINED subm tables (exact): the subm convs consume x-dilated-
        # only columns only via the y-combine of active outputs, so they
        # run on active + {dilated-only with an active y+-1 neighbor} —
        # measured 168,333 / 131,440 columns at stages 0/1 (68% / 80% of
        # the full dilation, micro_dilation_refine.py); caps give 6-9%
        # margin. The strided conv reads the full dilation via one
        # expand_columns gather per stage.
        subm_dilation_ratios=(1.40, 1.25),
        # stages >= 3 run as masked dense XLA 3D convs: at C>=128 the
        # native conv hits 112-162 TF/s (micro_conv_forms.py) and dense3
        # measured 914 ms vs 942 all-columns — exact spconv semantics,
        # no capacity caps (ops/sparse_dense.py).
        dense_from_stage=3,
        # Static z WINDOWS on the two sparse tables: LiDAR returns live in
        # a narrow global z band (ground plane .. max return height). At
        # bench density the active ranges are exactly [15, 39] of 41 and
        # [7, 20] of 21 (micro_zdist.py census), so these windows are
        # DROP-FREE there while cutting z-dense conv FLOPs + gather
        # traffic 48->25 / 24->14 per table: encoder 766 -> 571 ms
        # (ab_sparse_engine.py r5: tight 571 / (12,28) 579 / (8,32) 641).
        # Semantics: voxels outside a window are dropped with the same
        # documented capacity semantics as the column caps; in metric
        # units the kept band is z in [-2.0, 3.0) m — ground sits at
        # -1.84 m (nuScenes ego lidar height), so only sub-ground
        # returns (slopes below -2.0 m) could ever drop. Strided window
        # transitions are checked EXACT at trace time
        # (sparse_encoder.check_window_coverage).
        # The two DENSE tables take windows too (r5): (3, 8) and (1, 4)
        # are the EXACT strided images of the sparse windows above, so
        # they can never drop a site the sparse tables kept (the trace-
        # time coverage check enforces it) — they just stop the dense
        # convs from sweeping z cells no active site can reach
        # (11 -> 8 and 5 -> 4 stored depth).
        z_windows=((15, 25), (7, 14), (3, 8), (1, 4)),
        # 'columns' is the only engine. A z-windowed alternative was
        # built and measured 1544-1766 ms vs 681/942 here across three
        # layout redesigns; deleted in round 4 (PERF.md "window engine").
        engine='columns',
        compute_dtype='bfloat16'),

    fusion_encoder=dict(
        type='ISFusionEncoder',
        compute_dtype='bfloat16',
        num_points_in_pillar=12,
        embed_dims=256,
        num_classes=len(class_names),
        bev_size=bev_size,
        num_views=6,
        region_shape=region_shape,
        grid_size=grid_size,
        region_drop_info=region_drop_info,
        instance_num=200,
        # per-camera P2G partition capacities (host plan,
        # ops/host_plan.p2g_plan): measured per-camera primary counts at
        # bench density are <= 19,827 of P/6 = 40,000 and secondary
        # (multi-camera overlap) <= 9,509 — these caps carry every
        # contribution with ~20-25% margin while sampling 216k positions
        # instead of the brute path's 1.44M (6 cams x all 240k slots).
        # Overflow on any sample -> the plan omits p2g and the device
        # brute path runs (exactness is never at stake).
        p2g_cam_cap=24000,
        p2g_sec_per_cam=12000),

    pts_backbone=dict(
        type='SECONDV2',
        compute_dtype='bfloat16',
        in_channels=128,
        out_channels=[128, 256],
        layer_nums=[5, 5],
        layer_strides=[1, 2],
        norm_cfg=dict(type='BN', eps=1e-3, momentum=0.01),
        conv_cfg=dict(type='Conv2d', bias=False)),

    pts_neck=dict(
        type='SECONDFPN',
        compute_dtype='bfloat16',
        in_channels=[128, 256],
        out_channels=[256, 256],
        upsample_strides=[1, 2],
        norm_cfg=dict(type='BN', eps=1e-3, momentum=0.01),
        upsample_cfg=dict(type='deconv', bias=False),
        use_conv_for_no_stride=True),

    pts_bbox_head=dict(
        type='TransFusionHeadV2',
        compute_dtype='bfloat16',
        num_proposals=200,
        auxiliary=True,
        in_channels=256 * 2,
        hidden_channel=128,
        num_classes=len(class_names),
        num_decoder_layers=1,
        num_heads=8,
        nms_kernel_size=3,
        ffn_channel=256,
        dropout=0.1,
        bn_momentum=0.1,
        activation='relu',
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(
            type='TransFusionBBoxCoder',
            pc_range=point_cloud_range[:2],
            voxel_size=voxel_size[:2],
            out_size_factor=out_size_factor,
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            score_threshold=0.0,
            code_size=10),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2,
                      alpha=0.25, reduction='mean', loss_weight=1.0),
        loss_bbox=dict(type='L1Loss', reduction='mean', loss_weight=0.25),
        loss_heatmap=dict(type='GaussianFocalLoss', reduction='mean',
                          loss_weight=1.0)),

    train_cfg=dict(
        pts=dict(
            dataset='nuScenes',
            assigner=dict(
                type='HungarianAssigner3D',
                iou_calculator=dict(type='BboxOverlaps3D',
                                    coordinate='lidar'),
                cls_cost=dict(type='FocalLossCost', gamma=2, alpha=0.25,
                              weight=0.15),
                reg_cost=dict(type='BBoxBEVL1Cost', weight=0.25),
                iou_cost=dict(type='IoU3DCost', weight=0.25)),
            pos_weight=-1,
            gaussian_overlap=0.1,
            min_radius=2,
            grid_size=[voxel_shape, voxel_shape, 40],
            voxel_size=voxel_size,
            out_size_factor=out_size_factor,
            code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
            point_cloud_range=point_cloud_range)),
    test_cfg=dict(
        pts=dict(
            dataset='nuScenes',
            grid_size=[voxel_shape, voxel_shape, 40],
            out_size_factor=out_size_factor,
            pc_range=point_cloud_range[0:2],
            voxel_size=voxel_size[:2],
            nms_type=None,
            use_rotate_nms=True,
            nms_thr=0.2,
            max_num=200)))

dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)

# -- data recipe (parity: reference isfusion_0075voxel.py:194-396) --------
db_sampler = dict(
    type='MMDataBaseSamplerV2',
    data_root=data_root,
    info_path=data_root + 'nuscenes_dbinfos_train.pkl',
    rate=1.0,
    img_num=6,
    blending_type=None,
    depth_consistent=True,
    check_2D_collision=True,
    collision_thr=[0, 0.3, 0.5, 0.7],
    mixup=0.7,
    prepare=dict(
        filter_by_difficulty=[-1],
        filter_by_min_points=dict(
            car=5, truck=5, bus=5, trailer=5, construction_vehicle=5,
            traffic_cone=5, barrier=5, motorcycle=5, bicycle=5,
            pedestrian=5)),
    classes=class_names,
    sample_groups=dict(
        car=2, truck=3, construction_vehicle=7, bus=4, trailer=6,
        barrier=2, motorcycle=6, bicycle=6, pedestrian=2, traffic_cone=2),
    points_loader=dict(
        type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
        use_dim=[0, 1, 2, 3, 4]))

train_pipeline = [
    dict(type='LoadMultiViewImageFromFilesV2', to_float32=True),
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='ObjectSampleV2', stop_epoch=total_epochs - 2,
         db_sampler=db_sampler, sample_2d=True),
    dict(type='ModalMask3D', mode='train', stop_epoch=total_epochs - 2),
    dict(type='ImageAug3D', final_dim=img_scale, resize_lim=[0.57, 0.825],
         bot_pct_lim=[0.0, 0.0], rot_lim=[-5.4, 5.4], rand_flip=True,
         is_train=True),
    dict(type='GlobalRotScaleTransV2', resize_lim=[0.9, 1.1],
         rot_lim=[-0.78539816, 0.78539816], trans_lim=0.5, is_train=True),
    dict(type='RandomFlip3DV2'),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='ImageNormalize', mean=[0.485, 0.456, 0.406],
         std=[0.229, 0.224, 0.225]),
    dict(type='PointShuffle'),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         max_points=max_points, max_gt=128),
    dict(type='Collect3DV2',
         keys=['points', 'img', 'gt_bboxes_3d', 'gt_labels_3d'],
         meta_keys=['camera_intrinsics', 'camera2ego', 'lidar2ego',
                    'lidar2camera', 'camera2lidar', 'lidar2img',
                    'img_aug_matrix', 'lidar_aug_matrix']),
]

test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5,
         use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type='LoadMultiViewImageFromFilesV2', to_float32=True),
    dict(
        type='MultiScaleFlipAug3D',
        img_scale=img_scale,
        pts_scale_ratio=1.0,
        flip=False,
        transforms=[
            dict(type='ImageAug3D', final_dim=img_scale,
                 resize_lim=[0.72, 0.72], bot_pct_lim=[0.0, 0.0],
                 rot_lim=[0.0, 0.0], rand_flip=False, is_train=False),
            dict(type='ImageNormalize', mean=[0.485, 0.456, 0.406],
                 std=[0.229, 0.224, 0.225]),
            dict(type='GlobalRotScaleTransV2', resize_lim=[1.0, 1.0],
                 rot_lim=[0.0, 0.0], trans_lim=0.0, is_train=False),
            dict(type='RandomFlip3DV2'),
            dict(type='PointsRangeFilter',
                 point_cloud_range=point_cloud_range),
            dict(type='DefaultFormatBundle3D', class_names=class_names,
                 max_points=max_points, max_gt=128, with_label=False),
            dict(type='Collect3DV2', keys=['points', 'img'],
                 meta_keys=['camera_intrinsics', 'camera2ego', 'lidar2ego',
                            'lidar2camera', 'camera2lidar', 'lidar2img',
                            'img_aug_matrix', 'lidar_aug_matrix']),
        ])
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=6,
    train=dict(
        type='CBGSDataset',
        dataset=dict(
            type=dataset_type,
            data_root=data_root,
            ann_file=data_root + 'nuscenes_infos_train.pkl',
            pipeline=train_pipeline,
            classes=class_names,
            modality=input_modality,
            test_mode=False,
            use_valid_flag=False,
            box_type_3d='LiDAR',
            load_interval=1)),
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
evaluation = dict(interval=total_epochs // 2)

optimizer = dict(
    type='AdamW', lr=0.0001, weight_decay=0.01,
    paramwise_cfg=dict(custom_keys={'img_backbone': dict(lr_mult=0.1)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.01, norm_type=2))
lr_config = dict(policy='cyclic', target_ratio=(10, 0.0001),
                 cyclic_times=1, step_ratio_up=0.4)
momentum_config = dict(policy='cyclic', target_ratio=(0.8947368421052632, 1),
                       cyclic_times=1, step_ratio_up=0.4)
runner = dict(type='CustomEpochBasedRunner', max_epochs=total_epochs)
checkpoint_config = dict(interval=1)
log_config = dict(
    interval=50,
    hooks=[
        dict(type='TextLoggerHook'),
        dict(type='TensorboardLoggerHook'),
    ])
dist_params = dict(backend='nccl')  # ignored: jax.distributed + SPMD mesh
