from .image_folder import (
    DefaultPreparation,
    ImageFolderData,
    IPreparation,
    PackedImageDataset,
    ResizedPreparation,
    prepare_image_folder,
)
