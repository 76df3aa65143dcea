"""Synthetic raw detection documents per FIXTURES.md — golden inputs.

Hand-built small documents with known expected outputs; they exercise
the cleaning quirks the reference handles (null defaults, tz suffixes,
empty detection arrays, tail-open parking sessions).
"""

from __future__ import annotations

import json
from pathlib import Path


def _bbox(x1=0.0, y1=0.0, x2=10.0, y2=10.0):
    return [x1, y1, x2, y2]


def vehicle_doc() -> list[dict]:
    def det(tid, lane, direction, speed, stopped=False, rlv=False, lc=False, **kw):
        d = {
            "tracker_id": tid,
            "confidence": 0.9,
            "bbox": _bbox(),
            "class_id": 2,
            "vehicle_type": "car",
            "vehicle_direction": direction,
            "vehicle_lane": lane,
            "vehicle_color": "red",
            "stopped": stopped,
            "vehicle_speed": speed,
            "red_light_violation": rlv,
            "red_light_violation_time": None,
            "line_crossing": lc,
            "line_crossing_violation_time": None,
            "vehicle_entry_time": kw.get("entry"),
            "vehicle_exit_time": kw.get("exit"),
        }
        return d

    return [
        {
            "frame_number": 1,
            "congestion_level": 2,
            "traffic_light": "red",
            "detections": [
                det(1, "Left Lane", "Up", 10.0, entry="2024-05-01 12:00:00"),
                det(-1, "Left Lane", "Up", 0.0),  # invalid tracker → gold-filtered
            ],
        },
        {
            "frame_number": 2,
            "congestion_level": 2,
            "traffic_light": "red",
            "detections": [
                det(1, "Right Lane", "Up", 20.0, stopped=True,
                    entry="2024-05-01 12:00:05+05:30"),
            ],
        },
        {
            "frame_number": 3,
            "congestion_level": 1,
            "traffic_light": "green",
            "detections": [
                det(1, "Right Lane", "Down", 30.0, rlv=True, lc=True,
                    entry="2024-05-01 12:00:10 UTC"),
            ],
        },
        {"frame_number": 4, "congestion_level": 0, "traffic_light": "green",
         "detections": []},
    ]


def people_doc() -> dict:
    def det(tid, gender="Unknown", age="Unknown", restricted=False, **kw):
        return {
            "tracker_id": tid,
            "class_id": 0,
            "class_name": "person",
            "confidence": 0.8,
            "bbox": _bbox(),
            "in_area1": False,
            "in_area2": False,
            "in_restricted_area": restricted,
            "gender": gender,
            "age": age,
            "carrying": kw.get("carrying", "Unknown"),
            "entry_time": kw.get("entry"),
            "exit_time": None,
            "first_seen_frame": 1,
            "last_seen_frame": 3,
            "entered_restricted": restricted,
        }

    return {
        "video_metadata": {"filename": "v.mp4", "duration_seconds": 10.0,
                           "fps": 30.0, "width": 640, "height": 480},
        "processing_time": "2024-05-01 12:00:00",
        "summary": {"total_people": 2, "total_entering": 1, "total_exiting": 0,
                    "restricted_area_entries": 1, "restricted_people_ids": [7],
                    "fps": 30.0, "duration_seconds": 10.0},
        "frame_detections": [
            {"frame_number": 1, "timestamp": "2024-05-01 12:00:00",
             "detections": [det(7, "male", "20-30", entry="2024-05-01 12:00:00")]},
            {"frame_number": 2, "timestamp": "2024-05-01 12:00:01",
             "detections": [det(7, "male", "Unknown", restricted=True),
                            det(9, "female", "30-40")]},
            {"frame_number": 3, "timestamp": "2024-05-01 12:00:02",
             "detections": []},  # empty frame must survive
        ],
    }


def safety_doc() -> list[dict]:
    def person(tid, hardhat, mask, vest, status, missing):
        return {"hardhat": hardhat, "mask": mask, "safety_vest": vest,
                "tracker_id": tid, "safety_status": status,
                "missing_items": missing, "bbox": _bbox()}

    return [
        {"frame_number": 1,
         "people": [person(1, True, None, True, "Unsafe", ["mask"])]},
        {"frame_number": 2,
         "people": [person(1, True, False, True, "Unsafe", ["mask"]),
                    person(2, True, True, True, "Safe", [])]},
        {"frame_number": 3,
         "people": [person(1, False, True, True, "Unsafe", ["hardhat"])]},
    ]


def parking_doc() -> dict:
    # slot A: free→occupied→occupied→free (one closed session)
    # slot B: occupied at end (tail-open session)
    # slot C: never occupied (no sessions)
    def frame(n, t, a, b, c):
        return {
            "frame_number": n,
            "timestamp_sec": t,
            "slots": {
                "A": {"occupied": a, "bbox": _bbox(), "pixel_count": 10},
                "B": {"occupied": b, "bbox": _bbox(), "pixel_count": 10},
                "C": {"occupied": c, "bbox": _bbox(), "pixel_count": 10},
            },
            "free_slots": sum(not x for x in (a, b, c)),
        }

    return {
        "processing_date": "2024-05-01 00:00:00",
        "video_source": "lot.mp4",
        "video_info": {"width": 640, "height": 480, "fps": 30.0, "total_frames": 4},
        "parking_config": {
            "total_slots": 3,
            "slot_coordinates": {"A": [[0, 0], [1, 0], [1, 1], [0, 1]]},
            "detection_method": "bbox",
        },
        "frame_detections": [
            frame(1, 0.0, False, False, False),
            frame(2, 10.0, True, False, False),
            frame(3, 20.0, True, True, False),
            frame(4, 30.0, False, True, False),
        ],
    }


def pose_doc() -> list[dict]:
    kp = [{"landmark_id": float(i), "x": 0.1, "y": 0.2, "z": 0.0,
           "visibility": 0.9} for i in range(33)]
    return [
        {"frame_number": 1,
         "pose_data": [{"keypoints": kp, "action": "walk", "confidence": 0.9},
                       {"keypoints": kp, "action": "noise", "confidence": 0.05}]},
        {"frame": 2,  # alias form
         "pose_data": [{"keypoints": kp, "action": "walk", "confidence": 0.8}]},
    ]


def animal_doc() -> list[dict]:
    def det(cls, cx, cy, conf=0.8, area=100):
        return {"class_id": 1, "class_name": cls, "confidence": conf,
                "bbox": _bbox(cx - 5, cy - 5, cx + 5, cy + 5),
                "center": {"x": cx, "y": cy}, "area": area,
                "frame_number": 1, "timestamp": 0.5}

    return [
        {"frame_number": 1, "timestamp": 0.5,
         "detections": [det("dog", 15.0, 15.0), det("dog", 16.0, 14.0),
                        det("cat", 95.0, 95.0)]},
        {"frame_number": 2, "timestamp": 1.0,
         "detections": [det("dog", 15.5, 15.5),
                        {"class_id": None, "class_name": None, "confidence": None,
                         "bbox": None, "center": None, "area": None,
                         "frame_number": 2, "timestamp": 1.0}]},  # dropped row
    ]


def geolocation_doc() -> list[dict]:
    return [
        {"frame": 1, "class": "car", "confidence": 0.9, "bbox": _bbox(),
         "geolocation": {"latitude": 6.9, "longitude": 79.8}},
        {"frame": 2, "class": "car", "confidence": 0.05, "bbox": _bbox(),
         "geolocation": {"latitude": 7.0, "longitude": 79.9}},  # filtered
        {"frame": 3, "class": "bus", "confidence": 0.7, "bbox": _bbox(),
         "geolocation": {"latitude": 6.95, "longitude": 79.85}},
    ]


def common_doc() -> list[dict]:
    return [
        {"frame_number": 1, "tracker_id": 5, "class_id": 0, "class_name": "chair",
         "confidence": 0.9, "bbox": _bbox()},
        {"frame_number": 2, "tracker_id": 5, "class_id": 0, "class_name": "chair",
         "confidence": 0.8, "bbox": _bbox()},
        {"frame_number": 1, "tracker_id": -1, "class_id": 1, "class_name": "table",
         "confidence": 0.7, "bbox": _bbox(20.0, 20.0, 30.0, 30.0)},
    ]


def school_doc() -> list[dict]:
    def ev(eid, etype, ts, person, level, dur, roles):
        return {"event_id": eid, "event_type": etype, "timestamp": ts,
                "location": "yard", "confidence": 0.9,
                "involved_person_id": person, "duration_seconds": dur,
                "notes": "", "alert_level": level, "response_required": level == "high",
                "multiple_persons_involved": len(roles) > 1, "person_roles": roles}

    return [
        {"frame_number": 1, "timestamp": "2024-05-01 08:00:00",
         "detections": [ev("e1", "fight", "2024-05-01 08:00:00", "p1", "high", 5.0,
                           ["aggressor", "victim"])]},
        {"frame_number": 2, "timestamp": "2024-05-01 08:00:01",
         "detections": [ev("e1", "fight", "2024-05-01 08:00:01", "p2", "high", 7.0,
                           ["victim"]),
                        ev("e2", "running", "2024-05-01 08:00:01", "p3", "low", 2.0,
                           ["runner"])]},
    ]


def retail_doc() -> list[dict]:
    def prod(pid, name, price, stock, picked, expiry):
        return {"product_id": pid, "product_name": name, "category": "dairy",
                "location": "aisle1", "stock_level": stock, "price": price,
                "picked_by_customer": picked, "expiry_date": expiry}

    return [
        {"frame_number": 1, "timestamp": "2024-05-01 09:00:00",
         "detections": [prod("m1", "milk", 2.5, 10, False, "2024-06-01")]},
        {"frame_number": 2, "timestamp": "2024-05-01 09:00:01",
         "detections": [prod("m1", "milk", 3.5, 8, True, "2024-06-02"),
                        prod("y1", "yogurt", 1.0, 5, False, None)]},
    ]


def tracking_doc() -> dict:
    def det(gender, age, entry, exit_, ef, xf):
        return {"gender": gender, "age": age, "carrying": "Unknown",
                "confidence": 0.9, "entry_time": entry, "exit_time": exit_,
                "entry_frame": ef, "exit_frame": xf}

    return {
        "video_metadata": "v.mp4",
        "processing_time": "2024-05-01 12:00:00 UTC",
        "summary": "2 tracks",
        "detections": {
            # dynamic ids incl. one ("99") outside the reference's
            # hardcoded list — must survive here
            "2": det("male", 30, "2024-05-01 12:00:00", "2024-05-01 12:00:10", 1, 300),
            "99": det("female", None, "2024-05-01 12:00:05 UTC", None, 150, None),
        },
    }


DOCS = {
    "vehicle": vehicle_doc,
    "people": people_doc,
    "safety": safety_doc,
    "parking": parking_doc,
    "pose": pose_doc,
    "animal": animal_doc,
    "geolocation": geolocation_doc,
    "common": common_doc,
    "school": school_doc,
    "retail": retail_doc,
    "tracking": tracking_doc,
}


def write_fixture(tmpdir: str | Path, domain: str) -> str:
    path = Path(tmpdir) / f"{domain}.json"
    path.write_text(json.dumps(DOCS[domain]()))
    return str(path)
