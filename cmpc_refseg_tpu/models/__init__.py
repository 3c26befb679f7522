"""Model family: DeepLab-ResNet101 backbone, language encoders, CMPC core."""
