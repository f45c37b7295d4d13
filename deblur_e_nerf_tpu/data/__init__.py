from . import events, camera_poses, posed_images
