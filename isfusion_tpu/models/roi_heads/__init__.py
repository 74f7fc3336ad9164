from .part_aggregation_roi_head import PartAggregationROIHead  # noqa: F401
