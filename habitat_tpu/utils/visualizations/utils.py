"""Image/video helpers (reference habitat/utils/visualizations/utils.py)."""

from __future__ import annotations

import os
import textwrap
from typing import Dict, List, Optional, Tuple

import numpy as np


def tile_images(images: List[np.ndarray]) -> np.ndarray:
    """Tile N images into one (reference utils.py tile_images)."""
    assert len(images) > 0
    np_images = np.asarray(images)
    n, h, w, c = np_images.shape
    new_w = int(np.ceil(np.sqrt(n)))
    new_h = int(np.ceil(n / new_w))
    pad = np.zeros((new_w * new_h - n, h, w, c), np_images.dtype)
    np_images = np.concatenate([np_images, pad], axis=0)
    np_images = np_images.reshape(new_h, new_w, h, w, c)
    np_images = np_images.transpose(0, 2, 1, 3, 4)
    return np_images.reshape(new_h * h, new_w * w, c)


def observations_to_image(observation: Dict, info: Dict) -> np.ndarray:
    """Concatenate visual obs + topdown map into one frame
    (reference utils.py observations_to_image)."""
    render_obs_images: List[np.ndarray] = []
    for sensor_name, ob in observation.items():
        if sensor_name == "rgb":
            render_obs_images.append(np.asarray(ob))
        elif sensor_name == "depth":
            d = np.asarray(ob)
            d = np.clip(d, 0, 1)
            render_obs_images.append(
                (np.repeat(d, 3, axis=-1) * 255).astype(np.uint8)
            )
        elif sensor_name == "semantic":
            s = np.asarray(ob)[..., 0]
            rng = np.random.default_rng(42)
            palette = rng.integers(0, 255, (int(s.max()) + 2, 3), dtype=np.uint8)
            render_obs_images.append(palette[s])
    assert render_obs_images, "no visual sensors to render"
    shapes_are_equal = len({x.shape for x in render_obs_images}) == 1
    if shapes_are_equal:
        render_frame = np.concatenate(render_obs_images, axis=1)
    else:
        render_frame = tile_images(render_obs_images)

    if "top_down_map" in info and info["top_down_map"] is not None:
        import cv2

        td = np.asarray(info["top_down_map"])
        h = render_frame.shape[0]
        scale = h / td.shape[0]
        td = cv2.resize(
            td, (int(td.shape[1] * scale), h), interpolation=cv2.INTER_NEAREST
        )
        render_frame = np.concatenate([render_frame, td], axis=1)
    return render_frame


def images_to_video(
    images: List[np.ndarray],
    output_dir: str,
    video_name: str,
    fps: int = 10,
    quality: Optional[float] = 5,
    verbose: bool = True,
) -> None:
    """reference utils.py images_to_video (imageio/ffmpeg)."""
    import imageio

    os.makedirs(output_dir, exist_ok=True)
    video_name = video_name.replace(" ", "_").replace("\n", "_")
    path = os.path.join(output_dir, video_name + ".mp4")
    try:
        writer = imageio.get_writer(path, fps=fps, quality=quality)
        for im in images:
            writer.append_data(im)
        writer.close()
    except Exception:
        # no ffmpeg plugin in this image: fall back to GIF (PIL plugin)
        path = os.path.join(output_dir, video_name + ".gif")
        imageio.mimsave(path, images, duration=1.0 / fps)
    if verbose:
        from habitat_tpu.core.logging import logger

        logger.info(f"Video created: {path}")


def draw_collision(view: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Red border flash on collision (reference utils.py draw_collision)."""
    strip_width = view.shape[0] // 20
    mask = np.ones(view.shape[:2], dtype=bool)
    mask[strip_width:-strip_width, strip_width:-strip_width] = 0
    view[mask] = (alpha * np.array([255, 0, 0]) + (1.0 - alpha) * view)[mask]
    return view


def append_text_to_image(image: np.ndarray, text: str) -> np.ndarray:
    """reference utils.py append_text_underneath_image."""
    import cv2

    h, w = image.shape[:2]
    font_size = 0.5
    font_thickness = 1
    font = cv2.FONT_HERSHEY_SIMPLEX
    blank_image = np.zeros(image.shape, dtype=np.uint8)
    char_size = cv2.getTextSize(" ", font, font_size, font_thickness)[0]
    wrapped_text = textwrap.wrap(text, width=max(1, int(w / char_size[0])))
    y = 0
    for line in wrapped_text:
        textsize = cv2.getTextSize(line, font, font_size, font_thickness)[0]
        y += textsize[1] + 10
        cv2.putText(
            blank_image,
            line,
            (10, y),
            font,
            font_size,
            (255, 255, 255),
            font_thickness,
            lineType=cv2.LINE_AA,
        )
    text_image = blank_image[0 : y + 10, 0:w]
    return np.concatenate((image, text_image), axis=0)
