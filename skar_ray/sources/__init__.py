"""skar_ray.sources"""
