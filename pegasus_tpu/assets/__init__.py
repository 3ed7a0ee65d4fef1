from pegasus_tpu.assets.registry import Asset, AssetRegistry
