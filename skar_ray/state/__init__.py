"""skar_ray.state"""
