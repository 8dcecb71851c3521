"""Gallery output naming and HTML generation (image_database.py:1660-1888)."""

from pathlib import Path

from tpuclip.gallery.html import (
    combined_output_filename,
    file_display_url,
    generate_html_gallery,
    generate_output_filename,
)


def test_file_display_url_forms():
    # Windows drive letter → three slashes (image_database.py:1815-1817)
    assert file_display_url(r"E:\pics\cat.jpg") == "file:///E:/pics/cat.jpg"
    assert file_display_url("/data/x.png") == "file:///data/x.png"
    assert file_display_url("rel/x.png") == "file:///rel/x.png"


def test_output_filename_sanitization(tmp_path):
    out = generate_output_filename('a <red>/car?*"', results_dir=tmp_path)
    name = Path(out).name
    assert name == "a__red__car___.html" or all(c not in name for c in '<>:"/\\|?*')
    # spaces → underscores
    out2 = generate_output_filename("red car", results_dir=tmp_path)
    assert Path(out2).name == "red_car.html"


def test_output_filename_autoincrement(tmp_path):
    first = generate_output_filename("query", results_dir=tmp_path)
    Path(first).touch()
    second = generate_output_filename("query", results_dir=tmp_path)
    assert Path(second).name == "query_2.html"
    Path(second).touch()
    third = generate_output_filename("query", results_dir=tmp_path)
    assert Path(third).name == "query_3.html"


def test_output_filename_image_query_uses_stem(tmp_path):
    out = generate_output_filename("/photos/kitten.jpg", is_image_path=True, results_dir=tmp_path)
    assert Path(out).name == "kitten.html"


def test_output_filename_long_and_empty(tmp_path):
    out = generate_output_filename("x" * 300, results_dir=tmp_path)
    assert len(Path(out).stem) <= 100
    # invalid chars become underscores (not removed), like the reference
    out_q = generate_output_filename("???", results_dir=tmp_path)
    assert Path(out_q).name == "___.html"
    # fully stripped query ('...' rstrips to nothing) → default name
    out2 = generate_output_filename("...", results_dir=tmp_path)
    assert Path(out2).name == "query.html"


def test_combined_output_filename(tmp_path):
    out = combined_output_filename("red car", "/img/sun.jpg", False, True, results_dir=tmp_path)
    assert Path(out).name == "red_car_and_sun.html"


def test_gallery_html_contents(tmp_path):
    results = [("/data/a.jpg", 0.91234), (r"C:\pics\b.png", 0.5)]
    out = tmp_path / "g.html"
    generate_html_gallery(results, str(out), query="cats + dogs - birds")
    html = out.read_text()
    assert "Similarity: 0.9123" in html  # 4 decimal places
    assert "localexplorer:/data/a.jpg" in html
    assert "file:///C:/pics/b.png" in html
    assert "cats + dogs - birds" in html
    assert "Found 2 results" in html
    assert "onerror=" in html  # broken-image fallback


def test_gallery_escapes_html_in_paths(tmp_path):
    results = [("/data/<script>alert(1)</script>.jpg", 0.5)]
    out = tmp_path / "g.html"
    generate_html_gallery(results, str(out), query="<b>q</b>")
    html = out.read_text()
    assert "<script>alert(1)</script>" not in html
    assert "&lt;script&gt;" in html


def test_gallery_thumbnail_substitution(tmp_path):
    from PIL import Image

    from tpuclip.io.thumbnails import Thumbnailer

    src = tmp_path / "doc.bmp"
    Image.new("RGB", (600, 500), (10, 20, 30)).save(src)
    thumbnailer = Thumbnailer(str(tmp_path / "thumbs"))
    out = tmp_path / "g.html"
    generate_html_gallery([(str(src), 0.7)], str(out), thumbnailer=thumbnailer)
    html = out.read_text()
    thumbs = list((tmp_path / "thumbs").glob("*.jpg"))
    assert len(thumbs) == 1  # created on demand, content-hash named
    assert thumbs[0].name in html
    im = Image.open(thumbs[0])
    assert max(im.size) <= 400  # 400x400 bound, aspect preserved
