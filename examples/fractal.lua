-- Mandelbulb lit by a warm emitter, mirror-mixed surface.
return {
    image = {width = 512, height = 512},

    renderer = renderer.simple {
        pixel_samples = 300,
        spectrum_samples = 8,
        bounces = 6,
        light_samples = 2,
    },

    camera = camera.perspective {
        fov = 45,
        transform = transform.look_at {
            from = vector(2.4, 1.6, 2.4),
            to = vector(0, 0, 0),
            up = vector(0, 1, 0),
        },
    },

    world = {
        sky = 0.02,
        objects = {
            shape.ray_marched {
                shape = ray_marched.mandelbulb {
                    iterations = 12,
                    threshold = 4,
                    power = 8,
                },
                bounds = bounds.box {
                    min = vector(-1.3, -1.3, -1.3),
                    max = vector(1.3, 1.3, 1.3),
                },
                material = {
                    surface = mix(
                        material.mirror {color = 1},
                        material.diffuse {color = rgb(0.8, 0.6, 0.35)},
                        fresnel(1.45)
                    ),
                },
            },
            shape.sphere {
                position = vector(4, 5, 2),
                radius = 1.5,
                material = {
                    surface = material.emissive {color = blackbody(3800) * 2e-14},
                },
            },
        },
    },
}
