-- Dispersion demo: a glass wedge splitting a narrow directional beam.
local glass = {
    surface = material.refractive {
        ior = 1.62,
        dispersion = 0.012,
        color = 1,
    },
}

return {
    image = {width = 512, height = 288},

    renderer = renderer.simple {
        pixel_samples = 400,
        spectrum_samples = 1,
        bounces = 16,
        light_samples = 1,
    },

    camera = camera.perspective {
        fov = 40,
        transform = transform.look_at {
            from = vector(0, 3, 10),
            to = vector(0, 0.5, 0),
        },
    },

    world = {
        objects = {
            shape.plane {
                origin = vector(0, 0, 0),
                normal = vector(0, 1, 0),
                material = {surface = material.diffuse {color = 0.9}},
            },
            shape.sphere {
                position = vector(0, 1.2, 0),
                radius = 1.2,
                material = glass,
            },
            light.point {
                position = vector(-6, 6, 3),
                color = light_source.d65 * 400,
            },
        },
    },
}
