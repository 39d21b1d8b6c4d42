"""skar_ray.stages"""
