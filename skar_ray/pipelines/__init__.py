"""skar_ray.pipelines"""
